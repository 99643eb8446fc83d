package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.Streams

/** One-off floor probe for q_stream_stream_join (round-7 verdict item 7):
  * times shape variants of the click->purchase interval join in one JVM to
  * find which part of the ~2.3 s is machinery vs shape. Dev tooling.
  */
object StreamProbe {

  private def sides(ev: DataFrame): (DataFrame, DataFrame) = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    (clicks, purchases)
  }

  private def joined(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))

  private def drain(streamed: DataFrame, trigger: Option[Trigger]): Long = {
    val name = s"probe_${System.nanoTime()}"
    val w0 = streamed.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
    val w = trigger.fold(w0)(w0.trigger)
    val q = w.start()
    if (trigger.exists(_.isInstanceOf[Trigger]) && trigger.contains(Trigger.AvailableNow()))
      q.awaitTermination()
    else { q.processAllAvailable(); q.stop() }
    streamed.sparkSession.table(name).count()
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

    def time(label: String)(f: => Long): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        System.err.println(f"[probe] $label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      }

    // A: current shape — two sources, 4 state partitions, processAllAvailable
    time("two-src sp=4") {
      val ss = Streams.streamingSession(spark)
      val (c, p) = (sides(Streams.readEvents(ss, dir))._1, sides(Streams.readEvents(ss, dir))._2)
      drain(joined(c, p), None)
    }
    // B: single source self-join
    time("self-join sp=4") {
      val ss = Streams.streamingSession(spark)
      val ev = Streams.readEvents(ss, dir)
      val (c, p) = sides(ev)
      drain(joined(c, p), None)
    }
    // C: self-join + AvailableNow
    time("self-join availnow sp=4") {
      val ss = Streams.streamingSession(spark)
      val ev = Streams.readEvents(ss, dir)
      val (c, p) = sides(ev)
      drain(joined(c, p), Some(Trigger.AvailableNow()))
    }
    // D: self-join, 2 state partitions
    time("self-join sp=2") {
      val ss = Streams.streamingSession(spark, statePartitions = 2)
      val ev = Streams.readEvents(ss, dir)
      val (c, p) = sides(ev)
      drain(joined(c, p), None)
    }
    // E: self-join, 8 state partitions (is 4 even optimal?)
    time("self-join sp=8") {
      val ss = Streams.streamingSession(spark, statePartitions = 8)
      val ev = Streams.readEvents(ss, dir)
      val (c, p) = sides(ev)
      drain(joined(c, p), None)
    }
    spark.stop()
  }
}
