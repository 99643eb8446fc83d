package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Iceberg-style snapshot / time-travel read surface (SURVEY.md §2.1):
  * a table is a MANIFEST (version -> data-file list + per-file column
  * stats), not a directory listing. Two properties carried over from the
  * table-format designs (Iceberg/Delta), re-expressed with plain parquet +
  * a JSON manifest so both engines can replay every byte:
  *
  *   - snapshot isolation by manifest sharing: version 2 = version 1's
  *     data files + an appended file; nothing is rewritten, and reading
  *     version 1 after the append returns exactly the old rows.
  *   - planning cost is O(manifest), not O(objects): the reader never
  *     lists the data directory; at 100 TB / millions of files the
  *     manifest read (and the file-level min/max prune below) IS the
  *     scan-planning story, replacing a multi-minute object-store listing.
  *
  * Snapshot planning (manifest filter + file pruning) happens driver-side
  * over a frame bounded by the FILE COUNT — the same place Iceberg's
  * planner runs — never over data rows.
  *
  * The fixture table splits `orders` at X = max(o_orderkey) DIV 2: the
  * initial load (snap_lo: keys <= X) is version 1; version 2 appends
  * snap_hi (keys > X) and re-lists snap_lo in its manifest. X, the split
  * membership, and every census are pure functions of the input, so the
  * DuckDB oracle recomputes both snapshots without seeing the files.
  */
object TimeTravel {

  private def baseDir(name: String): String = {
    val d = new java.io.File(s"target/sink_tmp/$name")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Layout name for a fixture dir: sanitized for the filesystem PLUS a
    * hash of the raw path — sanitization alone maps distinct dirs (e.g.
    * `/data/sf0.1` vs `/data/sf0_1`) onto one layout while the build memo
    * keys by the raw dir, silently mixing snapshots across fixtures.
    */
  private def layoutName(dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"timetravel_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$h"
  }

  // n_rows recorded at write time (a table format's writer reads it off
  // the parquet footer) makes GC/CDF maintenance censuses pure manifest
  // queries — zero data reads at 100 TB.
  private val ManifestSchema =
    "version LONG, path STRING, min_key LONG, max_key LONG, n_rows LONG"

  // one snapshot-table build per (session, fixture) — the table format's
  // files PERSIST; a query re-writing them per invocation would model the
  // wrong thing and bill the write to every reader. Cold cost is
  // attributed through ArtifactMemo's artifact_build_s bench line.
  private val buildCache =
    new java.util.concurrent.ConcurrentHashMap[graft.text.ArtifactMemo.Key, String]()

  def build(s: SparkSession, dir: String): String =
    graft.text.ArtifactMemo.memoAny(buildCache, "timetravel", s, dir) {
      buildUncached(s, dir)
    }

  /** Build (overwrite) the two-snapshot table for the fixture at `dir`;
    * returns the base path. Per-file min/max stats are TRUE stats computed
    * from the written halves (one bounded 2-row aggregate), as a table
    * format's writer records them.
    */
  def buildUncached(s: SparkSession, dir: String): String = {
    val base = baseDir(layoutName(dir))
    val orders = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val xRow = orders.agg(expr("max(o_orderkey) DIV 2").as("x")).collect()(0)
    val x = if (xRow.isNullAt(0)) 0L else xRow.getLong(0)
    val lo = s"$base/data/snap_lo"
    val hi = s"$base/data/snap_hi"
    orders.filter(col("o_orderkey") <= x).write.mode(SaveMode.Overwrite).parquet(lo)
    orders.filter(col("o_orderkey") > x).write.mode(SaveMode.Overwrite).parquet(hi)
    val stats = orders
      .groupBy((col("o_orderkey") <= x).as("is_lo"))
      .agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"),
        count(lit(1)).as("cnt"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // an empty half gets the INVERTED envelope (0, -1): max_key < any
    // predicate bound, so the pruner always drops the empty file — the
    // totality edge for a 1-row (or empty) table
    val (loMn, loMx, loN) = stats.getOrElse(true, (0L, -1L, 0L))
    val (hiMn, hiMx, hiN) = stats.getOrElse(false, (0L, -1L, 0L))
    // version 2 SHARES snap_lo — the append rewrites nothing; version 3
    // is a COMPACTION: the whole table rewritten as one file, leaving
    // snap_lo/snap_hi referenced only by the older snapshots (the input
    // frame for q_snapshot_expire's orphan census)
    val all = s"$base/data/snap_all"
    orders.write.mode(SaveMode.Overwrite).parquet(all)
    val allRow = orders.agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"),
      count(lit(1)).as("cnt")).collect()(0)
    val (allMn, allMx) =
      if (allRow.isNullAt(0)) (0L, -1L) else (allRow.getLong(0), allRow.getLong(1))
    val allN = allRow.getLong(2)
    val manifest = Seq(
      (1L, lo, loMn, loMx, loN),
      (2L, lo, loMn, loMx, loN),
      (2L, hi, hiMn, hiMx, hiN),
      (3L, all, allMn, allMx, allN))
    import s.implicits._
    manifest.toDF("version", "path", "min_key", "max_key", "n_rows")
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$base/manifest")
    base
  }

  /** Driver-side snapshot planning: the file list for `version`, read from
    * the persisted manifest (never from a directory listing). The collect
    * is bounded by the manifest's file count — the planner's frame.
    */
  private def planSnapshot(s: SparkSession, base: String, version: Long,
                           minKeyAtLeast: Option[Long] = None): Seq[(String, Long, Long)] =
    s.read.schema(ManifestSchema).json(s"$base/manifest")
      .filter(col("version") === version)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .filter { case (_, _, mx) => minKeyAtLeast.forall(lo => mx >= lo) }
      .toSeq.sortBy(_._1)

  private def census(df: DataFrame, tag: Long): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .select(lit(tag).as("version"), col("n_rows"), col("sum_cents"),
        col("min_key"), col("max_key"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: time travel — census of version 1 read AFTER version 2 was
    // appended, beside version 2's. Version 1's files were shared, not
    // rewritten, so its census equals the pre-append table exactly
    // (snapshot isolation); the oracle recomputes both from `orders`.
    "q_time_travel" -> { (s, dir) =>
      val base = build(s, dir)
      def readV(v: Long): DataFrame =
        s.read.parquet(planSnapshot(s, base, v).map(_._1): _*)
      census(readV(1L), 1L).union(census(readV(2L), 2L)).orderBy("version")
    },

    // NS: manifest-stats file pruning — the Iceberg/Delta data-skipping
    // move: a predicate on the stats column drops whole FILES at plan
    // time (max_key < lo), before any parquet footer is opened. The
    // census carries the planner's own numbers (files total vs scanned)
    // as oracle-pinned literals, so a pruning regression goes hash-red.
    "q_manifest_prune" -> { (s, dir) =>
      val base = build(s, dir)
      // same null guard as the build path: an empty orders table yields a
      // NULL max and the recompute must not NPE
      val xRow = Tables.orders(s, dir)
        .agg(expr("max(o_orderkey) DIV 2").as("x")).collect()(0)
      val x = if (xRow.isNullAt(0)) 0L else xRow.getLong(0)
      val all = planSnapshot(s, base, 2L)
      val kept = planSnapshot(s, base, 2L, minKeyAtLeast = Some(x + 1))
      // every file pruned (degenerate 1-row table: the hi half is empty
      // and carries the inverted envelope): keep the read total with a
      // provably-empty scan instead of a zero-path reader error
      val src =
        if (kept.nonEmpty) s.read.parquet(kept.map(_._1): _*)
        else s.read.parquet(all.map(_._1): _*).filter(lit(false))
      // the pinned 2/1 oracle literals assume a positive-key fixture
      // (TPC-H o_orderkey >= 1): the lo half is then non-empty, so exactly
      // one of two files survives the prune
      src
        .filter(col("o_orderkey") > x)
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"))
        .select(lit(all.length.toLong).as("n_files_total"),
          lit(kept.length.toLong).as("n_files_scanned"),
          col("n_rows"), col("sum_cents"))
    },

    // NS: snapshot-expiry orphan census — the table-maintenance read every
    // iceberg-style layout needs before a GC pass: per data FILE, how many
    // snapshots reference it and whether the LATEST snapshot still does
    // (live = 0 means expiring the old snapshots orphans the file and its
    // bytes are reclaimable). Version 3 is a compaction rewrite, so the
    // pre-compaction halves are exactly the orphan set. Per-file row
    // counts come straight off the MANIFEST (recorded at write time, the
    // way a table format's writer reads them from the parquet footer), so
    // the whole census is a pure manifest query: ZERO data-file reads,
    // O(manifest) work at any table size. Plan-pinned (TimeTravelSpec
    // asserts no data file reaches the scan).
    "q_snapshot_expire" -> { (s, dir) =>
      val base = build(s, dir)
      val m = s.read.schema(ManifestSchema).json(s"$base/manifest")
        .withColumn("file", element_at(split(col("path"), "/"), -1))
      val latest = m.agg(max("version")).collect()(0).getLong(0)
      m.groupBy("file")
        .agg(count(lit(1)).as("n_versions"),
          max((col("version") === latest).cast("long")).as("live"),
          // every version lists the same bytes for a shared file, so the
          // per-file count is version-invariant; max is the safe fold
          max("n_rows").as("n_rows"))
        .select(col("file"), col("n_versions"), col("live"), col("n_rows"),
          // reclaimable = the file's rows become unreferenced once every
          // version below the latest is expired
          when(col("live") === 0, col("n_rows")).otherwise(0L).as("n_rows_freed"))
        .orderBy("file")
    },

    // NS: incremental / change-data-feed read — "give me the rows version
    // 2 added over version 1" answered from the manifest DIFF: the files
    // v2 lists that v1 does not ARE the appended slice (append-only
    // snapshots never rewrite), so the reader scans ONLY those files in
    // one multi-path read. Never a data-side anti-join of two snapshot
    // reads — at 100 TB the CDC consumer pays for the appended bytes, not
    // the table. Files-read count rides the output as an oracle-pinned
    // literal (1: the fixture append is one file).
    "q_snapshot_changes" -> { (s, dir) =>
      val base = build(s, dir)
      val v1 = planSnapshot(s, base, 1L).map(_._1).toSet
      val added = planSnapshot(s, base, 2L).map(_._1).filterNot(v1)
      s.read.parquet(added: _*)
        .agg(count(lit(1)).as("n_rows_added"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .select(lit(1L).as("version_from"), lit(2L).as("version_to"),
          lit(added.length.toLong).as("n_files_read"),
          col("n_rows_added"), col("sum_cents"), col("min_key"), col("max_key"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_time_travel" ->
      """WITH x AS (SELECT max(o_orderkey) // 2 AS xk FROM orders),
        |v1 AS (SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
        |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |              min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |       FROM orders, x WHERE o_orderkey <= xk),
        |v2 AS (SELECT CAST(2 AS BIGINT) AS version, count(*) AS n_rows,
        |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |              min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |       FROM orders)
        |SELECT * FROM v1 UNION ALL SELECT * FROM v2 ORDER BY version""".stripMargin,
    "q_manifest_prune" ->
      """WITH x AS (SELECT max(o_orderkey) // 2 AS xk FROM orders)
        |SELECT CAST(2 AS BIGINT) AS n_files_total,
        |       CAST(1 AS BIGINT) AS n_files_scanned,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders, x WHERE o_orderkey > xk""".stripMargin,
    // the file layout is a pure function of orders and the split point:
    // snap_lo (keys <= xk) referenced by v1+v2 and orphaned by the v3
    // compaction, snap_hi (keys > xk) referenced by v2 and orphaned,
    // snap_all (the compaction) live
    "q_snapshot_expire" ->
      """WITH x AS (SELECT max(o_orderkey) // 2 AS xk FROM orders),
        |c AS (SELECT count(*) AS n_all,
        |             CAST(sum(CASE WHEN o_orderkey <= xk THEN 1 ELSE 0 END) AS BIGINT) AS n_lo
        |      FROM orders, x)
        |SELECT t.file, t.n_versions, t.live, t.n_rows,
        |       CASE WHEN t.live = 0 THEN t.n_rows ELSE CAST(0 AS BIGINT) END AS n_rows_freed
        |FROM (SELECT 'snap_all' AS file, CAST(1 AS BIGINT) AS n_versions,
        |             CAST(1 AS BIGINT) AS live, (SELECT n_all FROM c) AS n_rows
        |      UNION ALL
        |      SELECT 'snap_hi', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
        |             (SELECT n_all - n_lo FROM c)
        |      UNION ALL
        |      SELECT 'snap_lo', CAST(2 AS BIGINT), CAST(0 AS BIGINT),
        |             (SELECT n_lo FROM c)) t
        |ORDER BY t.file""".stripMargin,
    // the appended slice is exactly the hi half (keys > xk); n_files_read
    // is pinned to 1 (the fixture append writes one file)
    "q_snapshot_changes" ->
      """WITH x AS (SELECT max(o_orderkey) // 2 AS xk FROM orders)
        |SELECT CAST(1 AS BIGINT) AS version_from,
        |       CAST(2 AS BIGINT) AS version_to,
        |       CAST(1 AS BIGINT) AS n_files_read,
        |       count(*) AS n_rows_added,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders, x WHERE o_orderkey > xk""".stripMargin
  )
}
