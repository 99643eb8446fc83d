package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Time-series operators over the events stream table (north-star
  * surface — the feature-engineering shapes a telemetry/training pipeline
  * runs): regular-grid resampling with fill, SCD-2 history construction,
  * and time-weighted averaging.
  *
  * Scale notes: every query here shuffles ONCE on user_id and then works
  * inside the partition (windows ordered by (ts, event_id) — a total order,
  * so results are exactly reproducible). The resample spine is generated
  * per user with `sequence` (rows ∝ users × hours — the grid, not the raw
  * event count) and joined back on the SAME user_id partitioning, so
  * spine+join+fill is one co-partitioned pipeline.
  */
object TimeSeriesQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: resample to a 1-hour grid per user — the irregular event stream
    // becomes a regular time series: per-hour event counts and last
    // observation, hours with no events gap-filled by carrying the last
    // observation forward. Deterministic "last in hour" = max over
    // (ts, event_id, value) structs (the (ts, event_id) pair is unique).
    "q_resample_1h" -> { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val hourly = e
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"),
          max(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("last_v"))
      val bounds = e.groupBy("user_id")
        .agg(min(date_trunc("hour", col("ts"))).as("h0"),
          max(date_trunc("hour", col("ts"))).as("h1"))
      val spine = bounds.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
      val w = Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("user_id", "hour"), "left_outer")
        .select(col("user_id"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          round(last("last_v", ignoreNulls = true).over(w), 6).as("filled"))
        .orderBy("user_id", "hour")
    },

    // NS: SCD type-2 history — collapse the per-user event_type stream into
    // validity intervals: a version starts where the type changes,
    // valid_to = the next change's timestamp (null = current version).
    // Change detection and interval closing are two windows over the same
    // (user_id, (ts, event_id)) order — one shuffle, one sort.
    "q_scd2_history" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
          lead("ts", 1).over(w).as("valid_to"),
          row_number().over(w).cast("long").as("version"))
        .withColumn("is_current", col("valid_to").isNull.cast("long"))
        .orderBy("user_id", "version")
    },

    // NS: time-weighted average — each observation weighted by how long it
    // was in force (until the next event); the standard aggregate for
    // unevenly-sampled series. Weights are exact integer microseconds; the
    // weighted sum crosses a float agg, so the quotient is rounded.
    "q_time_weighted_avg" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("gap_us",
          (unix_micros(lead("ts", 1).over(w)) - unix_micros(col("ts"))).cast("double"))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_segments"),
          round(sum(col("value") * col("gap_us")) / sum(col("gap_us")), 6).as("twa"))
        .orderBy("user_id")
    },

    // NS: ordered-sequence pattern match (the MATCH_RECOGNIZE shape): the
    // earliest click → view → purchase chain per user, each stage strictly
    // after the previous. Three per-user min-aggregates chained by
    // co-partitioned user_id joins — group sizes are per-user event counts,
    // so each stage is one key-local pass; no window sorts the full stream.
    "q_seq_pattern" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "ts", "event_type")
      val c = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val v = ev.filter(col("event_type") === "view")
        .join(c, "user_id").filter(col("ts") > col("t_click"))
        .groupBy("user_id", "t_click").agg(min("ts").as("t_view"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy("user_id", "t_click", "t_view").agg(min("ts").as("t_purchase"))
      p.select(col("user_id"), col("t_click"), col("t_view"), col("t_purchase"),
        (unix_micros(col("t_purchase")) - unix_micros(col("t_click"))).as("span_us"))
        .orderBy("user_id")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_resample_1h" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |h AS (SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n,
        |             (max(struct_pack(ts := ts, event_id := event_id, value := value))).value AS last_v
        |      FROM e GROUP BY user_id, hour),
        |b AS (SELECT user_id, min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
        |      FROM e GROUP BY user_id),
        |spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |j AS (SELECT s.user_id, s.hour, coalesce(h.n, 0) AS n_events, h.last_v
        |      FROM spine s LEFT JOIN h USING (user_id, hour))
        |SELECT user_id, hour, CAST(n_events AS BIGINT) AS n_events,
        |       round(last_value(last_v IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
        |FROM j ORDER BY user_id, hour""".stripMargin,
    "q_scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |m AS (SELECT user_id, event_id, ts, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |      FROM e),
        |c AS (SELECT user_id, event_id, ts, event_type FROM m
        |      WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
        |       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BIGINT) AS is_current
        |FROM c ORDER BY user_id, version""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |g AS (SELECT user_id, value,
        |             CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) -
        |                  epoch_us(ts) AS DOUBLE) AS gap_us
        |      FROM e)
        |SELECT user_id, count(*) AS n_segments,
        |       round(sum(value * gap_us) / sum(gap_us), 6) AS twa
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_seq_pattern" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |c AS (SELECT user_id, min(ts) AS t_click FROM e
        |      WHERE event_type = 'click' GROUP BY user_id),
        |v AS (SELECT e.user_id, c.t_click, min(e.ts) AS t_view
        |      FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'view' AND e.ts > c.t_click
        |      GROUP BY e.user_id, c.t_click),
        |p AS (SELECT e.user_id, v.t_click, v.t_view, min(e.ts) AS t_purchase
        |      FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        |      GROUP BY e.user_id, v.t_click, v.t_view)
        |SELECT user_id, t_click, t_view, t_purchase,
        |       epoch_us(t_purchase) - epoch_us(t_click) AS span_us
        |FROM p ORDER BY user_id""".stripMargin
  )
}
