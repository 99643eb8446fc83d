package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True Structured Streaming forms of the §2.9 surface: `readStream` →
  * watermarked/windowed transforms → `writeStream`. Batch-equivalent
  * results are oracle-checked via [[EventQueries]]; the stateful behaviors
  * here (watermark late-drop, in-stream dedup, incremental K-Means state)
  * are covered by MemoryStream ScalaTests (SURVEY.md §5.5).
  *
  * The reference is batch-only — its only state across time is the centroid
  * list the master carries between iterations (/root/reference/master.py:
  * 115-152); [[incrementalKmeans]] holds exactly that state (per-centroid
  * running sum + count, reducer.py:21-25) as streaming state.
  */
object Streams {

  /** A typed event row (see FIXTURES.md: events table). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Open the events table as a file stream with the same schema the batch
    * loader produces. `maxFilesPerTrigger` keeps micro-batches bounded on a
    * multi-file 100 TB directory.
    */
  // (sfDir -> events schema), memoized per context like the other fixture
  // artifacts: every streaming key re-read the parquet footer just to
  // recover the static schema (r13; ~50 ms x 6 keys of pure repeat I/O)
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    graft.text.ArtifactMemo.Key, org.apache.spark.sql.types.StructType]()

  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // schema via the batch loader's guarded read: a nanos fixture in a
    // conf-less session fails with the message naming NanosAsLongConf,
    // not a bare [PARQUET_TYPE_ILLEGAL]
    val schema = graft.text.ArtifactMemo.memoAny(schemaCache, "events_schema", spark, sfDir) {
      graft.core.Tables.eventsRead(spark, sfDir).schema
    }
    // file streams want a directory: stream the sf dir, globbed to events
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    // same ts-type dispatch as the batch loader — SHARED arm list
    // (Tables.normalizeEventTs), so an unexpected regen'd ts type fails
    // loudly in one place for batch and stream alike
    graft.core.Tables.normalizeEventTs(raw, schema("ts").dataType)
  }

  /** Tumbling 1-hour counts with a 1-hour watermark: late events beyond the
    * watermark are dropped (q_stream_watermark + q_stream_tumbling).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Sliding 1-hour/15-minute counts under the same watermark. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Per-user 30-minute-gap sessions (q_stream_session, streaming form). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("w_start"), col("n_events"))

  /** Exactly-once event ids within the watermark horizon (q_stream_dedup). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-key streaming state for [[incrementalKmeans]]: the reducer's
    * running (elementwise sum, count) — reducer.py:21-25 — kept alive
    * across micro-batches.
    */
  case class CentroidState(sum: Array[Double], n: Long)
  case class Assigned(cid: Int, coordinates: Array[Double])
  case class CentroidUpdate(cid: Int, coordinates: Array[Double], n: Long)

  /** q_stream_kmeans (stretch): incremental centroid update over an
    * already-assigned vector stream. Each micro-batch folds its vectors
    * into per-cid (sum, n) state and emits the current mean — the
    * reference's reduce step running continuously instead of per-iteration.
    */
  def incrementalKmeans(assigned: Dataset[Assigned]): Dataset[CentroidUpdate] = {
    import assigned.sparkSession.implicits._
    assigned
      .groupByKey(_.cid)
      .mapGroupsWithState[CentroidState, CentroidUpdate](GroupStateTimeout.NoTimeout) {
        (cid: Int, rows: Iterator[Assigned], state: GroupState[CentroidState]) =>
          val prev = state.getOption.getOrElse(CentroidState(Array.emptyDoubleArray, 0L))
          var sum = prev.sum
          var n = prev.n
          rows.foreach { a =>
            if (sum.isEmpty) sum = new Array[Double](a.coordinates.length)
            var i = 0
            while (i < sum.length) { sum(i) += a.coordinates(i); i += 1 }
            n += 1
          }
          state.update(CentroidState(sum, n))
          CentroidUpdate(cid, if (n == 0) sum else sum.map(_ / n), n)
      }
  }

  /** Output row of [[RunningTotalsProcessor]]. */
  case class UserTotals(user_id: Long, n: Long, sum_value: Double)

  /** Per-user running (count, sum) via Spark 4's `transformWithState`
    * arbitrary-state API (the successor of mapGroupsWithState: typed state
    * handles, TTL support, RocksDB-backed). One ValueState cell per user —
    * state size is O(users), not O(events), and the RocksDB provider keeps
    * it off-heap/spillable at stream scale.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; s += e.value }
      totals.update((n, s))
      Iterator.single(UserTotals(key, n, s))
    }
  }

  /** Child session for streaming runs, with the state-partition count cut
    * down: every stateful operator commits one state store per shuffle
    * partition per micro-batch, so a batch-engine default (32 at bench
    * config) is pure per-batch commit/IO overhead on small micro-batches.
    * At 100 TB the state-partition count is sized to stream key cardinality
    * and rate — independently of the batch engine's shuffle width — which
    * is exactly what a separate session scope expresses. Confs set at
    * parent-session construction (e.g. nanosAsLong) are inherited via the
    * shared SparkContext conf.
    */
  def streamingSession(parent: SparkSession, statePartitions: Int = 4): SparkSession = {
    val child = parent.newSession()
    child.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    child
  }

  /** Scratch base for per-query streaming checkpoints: tmpfs when the box
    * has one, else the JVM temp dir. A TEMP checkpoint has no durability
    * contract by design (Spark deletes its own temp checkpoints on stop;
    * `forceDeleteTempCheckpointLocation` exists precisely because they are
    * scratch), so placing it on tmpfs changes no semantics — it only stops
    * charging every micro-batch's offset/commit/state-delta fsync-rename
    * traffic to a spinning-rust path (guide §6: put scratch I/O on the
    * fast medium; measured 0.1-0.35 s per stateful key at fixture scale).
    * Production checkpoints are DURABLE and configured per deployment —
    * this helper is only ever used for drained-to-batch runs whose result
    * is read back from the memory sink. Overridable via
    * `spark.graft.stream.ckptBase` for environments where tmpfs is absent.
    */
  private[streaming] def ckptBase(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.stream.ckptBase").getOrElse {
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_stream_ckpt"
      else System.getProperty("java.io.tmpdir") + "/graft_stream_ckpt"
    }

  private[streaming] def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Run any of the above to completion against the (finite) file stream and
    * return the final result as a batch DataFrame — used by tests. The
    * memory sink registers its table in the session that owns the stream
    * (which may be a [[streamingSession]] child), so the result is read
    * back from `streamed.sparkSession`, not from the caller's session.
    *
    * r13: Trigger.AvailableNow is the DEFAULT drain — it plans the full
    * file listing once up front, drains, and self-terminates: one fewer
    * empty finalization micro-batch than processAllAvailable on a finite
    * source. Probed per shape (r13): watermarked Append still runs its
    * no-data emission batch and returns identical rows (3590 = 3590);
    * Update/Complete shapes drop from 2 batches to 1. Each query gets a
    * UNIQUE scratch checkpoint dir (state isolation — nothing is shared
    * across queries) which is deleted after the drain.
    */
  def runToBatch(spark: SparkSession, streamed: DataFrame, mode: OutputMode = OutputMode.Complete(),
                 availableNow: Boolean = true): DataFrame = {
    val name = s"graft_sink_${System.nanoTime()}"
    val ckpt = s"${ckptBase(spark)}/$name"
    val writer = streamed.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation", ckpt)
    try {
      if (availableNow) {
        val q = writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      } else {
        val q = writer.start()
        q.processAllAvailable()
        q.stop()
      }
    } finally deleteRecursively(new java.io.File(ckpt))
    streamed.sparkSession.table(name)
  }
}
