package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.Streams

/** Round-13 floor probe for the six true-streaming keys (~6.6 s of the
  * bench): times each candidate machinery lever per shape in one JVM so
  * wins are attributable before any query changes. Dev tooling.
  *
  * Levers probed (guide §1.2 — fix the floor you actually measured):
  *   ckpt=shm   checkpoint dir on tmpfs instead of java.io.tmpdir (disk)
  *   sp=N       state partitions (streamingSession shuffle width)
  *   avail      Trigger.AvailableNow instead of processAllAvailable
  *   nodata=off spark.sql.streaming.noDataMicroBatches.enabled=false
  */
object StreamFloorProbe {

  private def joinedSides(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
  }

  private def drain(streamed: DataFrame, mode: OutputMode, availableNow: Boolean,
                    ckptBase: Option[String]): (Long, Int) = {
    val name = s"probe_${System.nanoTime()}"
    var w = streamed.writeStream.format("memory").queryName(name).outputMode(mode)
    ckptBase.foreach { base => w = w.option("checkpointLocation", s"$base/$name") }
    val q =
      if (availableNow) { val q = w.trigger(Trigger.AvailableNow()).start(); q.awaitTermination(); q }
      else { val q = w.start(); q.processAllAvailable(); q.stop(); q }
    val batches = q.recentProgress.length
    (streamed.sparkSession.table(name).count(), batches)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.Tables.NanosAsLongConf._1, graft.core.Tables.NanosAsLongConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => (Long, Int)): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val (n, b) = f
        System.err.println(
          f"[probe] $label%-44s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n%-7d batches=$b")
      }

    val shm = "/dev/shm/graft_probe_ckpt"

    // ---- shape 1: stream-stream interval join (bench #1 in the family)
    def ssj(sp: Int, avail: Boolean, ckpt: Option[String], nodata: Option[Boolean]): (Long, Int) = {
      val ss = Streams.streamingSession(spark, statePartitions = sp)
      nodata.foreach(v => ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v.toString))
      (drain(joinedSides(Streams.readEvents(ss, dir)), OutputMode.Append(), avail, ckpt))
    }
    time("ssj baseline sp=4 avail")        { ssj(4, avail = true, None, None) }
    time("ssj sp=4 avail ckpt=shm")        { ssj(4, avail = true, Some(shm), None) }
    time("ssj sp=1 avail ckpt=shm")        { ssj(1, avail = true, Some(shm), None) }
    time("ssj sp=2 avail ckpt=shm")        { ssj(2, avail = true, Some(shm), None) }
    time("ssj sp=1 avail ckpt=shm nodata=off") { ssj(1, avail = true, Some(shm), Some(false)) }

    // ---- shape 2: transformWithState (RocksDB provider, Update mode)
    def tws(sp: Int, avail: Boolean, ckpt: Option[String]): (Long, Int) = {
      val ss = Streams.streamingSession(spark, statePartitions = sp)
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import ss.implicits._
      val ev = Streams.readEvents(ss, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streams.Event]
      val out = ev.groupByKey(_.user_id)
        .transformWithState(new Streams.RunningTotalsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
      drain(out.toDF(), OutputMode.Update(), avail, ckpt)
    }
    time("tws baseline sp=4 procAll")      { tws(4, avail = false, None) }
    time("tws sp=4 avail")                 { tws(4, avail = true, None) }
    time("tws sp=4 avail ckpt=shm")        { tws(4, avail = true, Some(shm)) }
    time("tws sp=1 avail ckpt=shm")        { tws(1, avail = true, Some(shm)) }

    // ---- shape 3: watermarked tumbling append (needs the no-data batch)
    def wm(sp: Int, avail: Boolean, ckpt: Option[String]): (Long, Int) = {
      val ss = Streams.streamingSession(spark, statePartitions = sp)
      drain(Streams.tumblingCounts(Streams.readEvents(ss, dir)), OutputMode.Append(), avail, ckpt)
    }
    time("wm baseline sp=4 procAll")       { wm(4, avail = false, None) }
    time("wm sp=4 avail")                  { wm(4, avail = true, None) }
    time("wm sp=1 avail ckpt=shm")         { wm(1, avail = true, Some(shm)) }

    // ---- shape 4: stream-static join, Complete mode
    def sst(sp: Int, avail: Boolean, ckpt: Option[String]): (Long, Int) = {
      val ss = Streams.streamingSession(spark, statePartitions = sp)
      val ev = Streams.readEvents(ss, dir)
      val cust = graft.core.Tables.customer(ss, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val joined = ev.join(cust, ev("user_id") === cust("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      drain(joined, OutputMode.Complete(), avail, ckpt)
    }
    time("sst baseline sp=4 procAll")      { sst(4, avail = false, None) }
    time("sst sp=1 avail ckpt=shm")        { sst(1, avail = true, Some(shm)) }

    // cleanup probe checkpoints
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(shm)).deleteRecursively()
    } catch { case _: Throwable => }
    spark.stop()
  }
}
