package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed model-TRAINING primitives: the two aggregates a
  * tree/linear-model trainer actually distributes — histogram-based best
  * split finding (the inner loop of every GBDT implementation) and a
  * full-batch logistic-regression gradient (the allreduce of every
  * data-parallel optimizer).
  *
  * Reference scope: the K-Means repo's mean-update (reducer.py:19-30) is
  * the same shape — per-group sufficient statistics folded map-side, model
  * recombined from a bounded frame; these queries generalize it to
  * supervised-learning statistics.
  *
  * Scale design: both queries reduce the fact table to a MODEL-SIZED frame
  * (feature×bin histogram cells; a d-long gradient vector) in ONE
  * map-side-combinable aggregate; everything after the shuffle is
  * arithmetic over that bounded frame. No row-scale float sum anywhere:
  * split statistics fold exact BIGINT counts (the chi-square is a fixed
  * IEEE expression tree over those integers, rounded at 6dp — the
  * EvalMetricsQueries discipline), and the gradient is exact because at
  * w=0 the logistic residual (y - 1/2) makes grad_j = 1/2·Σ sgn·x_j a pure
  * integer sum in micro-units.
  */
object TrainQueries {

  /** Split-candidate bins per feature (l_quantity DIV 5 → 0..10 bins;
    * discount cents → 0..10): a fixed histogram, the GBDT trick that
    * makes split finding one combinable aggregate instead of a sort.
    */
  private val QtyBinWidth = 5L

  /** (feature, bin, pos) rows: one explode per lineitem row into its two
    * feature cells; the groupBy collapses to <= 22 cells per partition
    * before the shuffle (partial aggregation), so the explode never
    * doubles shuffled bytes.
    */
  private def featureCells(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        (col("l_returnflag") === "R").cast("long").as("pos"),
        expr(s"CAST(l_quantity AS BIGINT) DIV $QtyBinWidth").as("qty_bin"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_bin"))
      .select(col("pos"), explode(array(
        struct(lit("qty").as("feature"), col("qty_bin").as("bin")),
        struct(lit("disc").as("feature"), col("disc_bin").as("bin")))).as("fb"))
      .groupBy(col("fb.feature").as("feature"), col("fb.bin").as("bin"))
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: histogram best-split finder, the GBDT inner loop. Every split
    // candidate "feature <= bin" is scored by the 2x2 chi-square of the
    // (left/right, pos/neg) partition, from EXACT BIGINT cumulative counts
    // (window over the <=22-cell histogram — nothing after the first
    // aggregate scales with N). All BIGINT products are bounded: the
    // determinant |posL*negR - negL*posR| <= N^2 (3.6e11 at sf0.1, exact
    // as double), and the denominator is split as (nL*nR)·(posT*negT),
    // each <= N^2, BEFORE the double multiply — never a 4-way BIGINT
    // product that would wrap at N >= 56k. The chi2 itself is a fixed
    // IEEE tree over exact ints, rounded at 6dp on both engines.
    "q_tree_split" -> { (s, dir) =>
      val cells = featureCells(s, dir)
      val wCum = Window.partitionBy("feature").orderBy("bin")
      val wAll = Window.partitionBy("feature")
      val scored = cells
        .withColumn("n_left", sum("n").over(wCum))
        .withColumn("pos_left", sum("np").over(wCum))
        .withColumn("n_tot", sum("n").over(wAll))
        .withColumn("pos_tot", sum("np").over(wAll))
        .withColumn("n_right", col("n_tot") - col("n_left"))
        .withColumn("pos_right", col("pos_tot") - col("pos_left"))
        .filter(col("n_right") > 0)
        .withColumn("det",
          col("pos_left") * (col("n_right") - col("pos_right")) -
            (col("n_left") - col("pos_left")) * col("pos_right"))
        .filter(col("pos_tot") > 0 && col("pos_tot") < col("n_tot"))
        .withColumn("chi2", round(
          col("n_tot").cast("double") * col("det").cast("double") * col("det").cast("double") /
            ((col("n_left") * col("n_right")).cast("double") *
              (col("pos_tot") * (col("n_tot") - col("pos_tot"))).cast("double")), 6))
      scored
        .withColumn("rk", row_number().over(
          Window.orderBy(col("chi2").desc, col("feature"), col("bin"))))
        .select(col("feature"), col("bin").as("split_bin"),
          col("n_left"), col("pos_left"), col("n_right"), col("pos_right"),
          col("chi2"), (col("rk") === 1).cast("long").as("is_best"))
        .orderBy("feature", "split_bin")
    },

    // NS: one exact full-batch logistic-regression gradient step over the
    // embeddings (first 8 dims, micro-int units; y = label DIV 5). At
    // w = 0 the predicted probability is exactly 1/2, so the gradient
    // direction 2·Σ(y - 1/2)·x = Σ sgn·x is a PURE BIGINT sum — the one
    // point on the loss surface where the logistic allreduce needs no
    // transcendentals. The updated linear scorer sign(g·x) is then graded
    // in exact integer arithmetic (margin |Σ g_j·x_j| < 8·5e6·|g| stays
    // under 2^63 through the 10x stress scale — bound in the margin
    // comment). Dataflow: one d-bounded aggregate (the allreduce), the
    // 1-row model broadcast back, one scoring aggregate — data never
    // leaves executors, the model frame is the only thing that moves.
    "q_logreg_step" -> { (s, dir) =>
      // CAST ... AS DOUBLE before scaling on BOTH engines: Tables.embeddings
      // widens the parquet float32 to double, but DuckDB reads the raw
      // column and multiplies float*int in FLOAT — without the explicit
      // cast the micro-unit quantization disagrees by ±1 on a few rows,
      // which a full-corpus SUM (unlike a per-row verdict) always exposes.
      val xq = (j: Int) =>
        expr(s"CAST(round(CAST(element_at(embedding, $j) AS DOUBLE) * 1000000) AS BIGINT)")
          .as(s"x$j")
      val base = Tables.embeddings(s, dir)
        .select((Seq(col("vec_id"), expr("CAST(label AS BIGINT) DIV 5").as("y")) ++
          (1 to 8).map(xq)): _*)
        .withColumn("sgn", col("y") * 2 - 1)
      val gradCols = Seq(count(lit(1)).as("n"), sum("y").as("n_pos")) ++
        (1 to 8).map(j => sum(col("sgn") * col(s"x$j")).as(s"g$j"))
      val grad = base.agg(gradCols.head, gradCols.tail: _*)
      // margin_i = sum_j g_j * x_ij: g_j <= n_rows*5e6 and x <= 5e6, so
      // 8 * (2e4 * 5e6) * 5e6 = 4e18 < 2^63 at the synthetic-sf1 stress
      // row count — exact BIGINT, no wrap.
      val margin = (1 to 8).map(j => col(s"g$j") * col(s"x$j"))
        .reduce(_ + _)
      val outCols = Seq(
        max("n").as("n"), max("n_pos").as("n_pos"),
        expr("CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) * 1000000 DIV max(n) AS BIGINT)")
          .as("acc_ppm")) ++
        (1 to 8).map(j => max(s"g$j").as(s"g$j"))
      base.crossJoin(broadcast(grad))
        .withColumn("pred", (margin > 0).cast("long"))
        .agg(outCols.head, outCols.tail: _*)
    },

    // NS: one rank-1 ALS half-sweep — the matrix-factorization training
    // step every recommender distributes: ratings r(user, item) in exact
    // milli-units; item factors initialized to v0 = 1000 milli; user
    // factors solved in closed form u = Σ(r·v) DIV (Σ v² DIV 1000), then
    // item factors re-solved v1 = Σ(r·u) DIV (Σ u² DIV 1000), then the
    // residual SSE per item under (u, v1). All quantities non-negative
    // (values >= 0), so truncating DIV agrees with DuckDB's flooring //;
    // BIGINT bounds hold through the 10x stress scale (r <= 7e6 milli,
    // Σr·u <= 7e17). Dataflow is the canonical ALS alternation: one
    // (user, item) rating aggregate, one user-key solve, a join back on
    // user (u is ROW-SCALE at real scale — shuffle join, never collect),
    // one item-key solve, one item-key residual aggregate.
    "q_als_step" -> { (s, dir) =>
      val r = Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type").as("item"))
        .agg(expr("CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)").as("r_milli"))
        .withColumn("v0", lit(1000L))
        .localCheckpoint() // feeds the u-solve, the v-solve and the residual pass
      val u = r.groupBy("user_id")
        .agg(expr("CAST(sum(r_milli * v0) DIV (sum(v0 * v0) DIV 1000) AS BIGINT)").as("u_milli"))
      val ru = r.join(u, "user_id").localCheckpoint()
      val v1 = ru.groupBy("item")
        .agg(expr("CAST(sum(r_milli * u_milli) DIV (sum(u_milli * u_milli) DIV 1000) AS BIGINT)")
          .as("v1_milli"))
      ru.join(broadcast(v1), "item")
        .withColumn("res", col("r_milli") - expr("u_milli * v1_milli DIV 1000"))
        .groupBy("item")
        .agg(count(lit(1)).as("n_ratings"),
          max("v1_milli").as("v1_milli"),
          sum(col("res") * col("res")).as("sse_milli2"))
        .orderBy("item")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_tree_split" ->
      s"""WITH cells AS (
         |  SELECT feature, bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS np
         |  FROM (
         |    SELECT CAST(l_returnflag = 'R' AS BIGINT) AS pos,
         |           unnest(['qty', 'disc']) AS feature,
         |           unnest([CAST(l_quantity AS BIGINT) // $QtyBinWidth,
         |                   CAST(round(l_discount * 100) AS BIGINT)]) AS bin
         |    FROM lineitem)
         |  GROUP BY feature, bin),
         |cum AS (
         |  SELECT feature, bin,
         |         CAST(sum(n)  OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS n_left,
         |         CAST(sum(np) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT) AS pos_left,
         |         CAST(sum(n)  OVER (PARTITION BY feature) AS BIGINT) AS n_tot,
         |         CAST(sum(np) OVER (PARTITION BY feature) AS BIGINT) AS pos_tot
         |  FROM cells),
         |sc AS (
         |  SELECT feature, bin, n_left, pos_left,
         |         n_tot - n_left AS n_right, pos_tot - pos_left AS pos_right,
         |         pos_left * ((n_tot - n_left) - (pos_tot - pos_left))
         |           - (n_left - pos_left) * (pos_tot - pos_left) AS det,
         |         n_tot, pos_tot
         |  FROM cum
         |  WHERE n_tot - n_left > 0 AND pos_tot > 0 AND pos_tot < n_tot),
         |sc2 AS (
         |  SELECT feature, bin, n_left, pos_left, n_right, pos_right,
         |         round(CAST(n_tot AS DOUBLE) * CAST(det AS DOUBLE) * CAST(det AS DOUBLE)
         |               / (CAST(n_left * n_right AS DOUBLE)
         |                  * CAST(pos_tot * (n_tot - pos_tot) AS DOUBLE)), 6) AS chi2
         |  FROM sc)
         |SELECT feature, bin AS split_bin, n_left, pos_left, n_right, pos_right, chi2,
         |       CAST(row_number() OVER (ORDER BY chi2 DESC, feature, bin) = 1 AS BIGINT) AS is_best
         |FROM sc2
         |ORDER BY feature, split_bin""".stripMargin,
    "q_logreg_step" -> {
      val xs = (1 to 8).map(j =>
        s"CAST(round(CAST(embedding[$j] AS DOUBLE) * 1000000) AS BIGINT) AS x$j")
        .mkString(",\n        |         ")
      val gs = (1 to 8).map(j => s"CAST(sum(sgn * x$j) AS BIGINT) AS g$j").mkString(",\n        |         ")
      val dot = (1 to 8).map(j => s"g.g$j * b.x$j").mkString(" + ")
      s"""WITH base AS (
         |  SELECT vec_id, CAST(label AS BIGINT) // 5 AS y,
         |         CAST(label AS BIGINT) // 5 * 2 - 1 AS sgn,
         |         $xs
         |  FROM embeddings),
         |g AS (
         |  SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         |         $gs
         |  FROM base)
         |SELECT g.n AS n, g.n_pos AS n_pos,
         |       CAST(sum(CASE WHEN ($dot > 0) = (b.y = 1) THEN 1 ELSE 0 END)
         |            * 1000000 // g.n AS BIGINT) AS acc_ppm,
         |       ${(1 to 8).map(j => s"g.g$j AS g$j").mkString(", ")}
         |FROM base b CROSS JOIN g
         |GROUP BY g.n, g.n_pos, ${(1 to 8).map(j => s"g.g$j").mkString(", ")}""".stripMargin
    },
    // identical integer alternation; all operands non-negative so // = DIV
    "q_als_step" ->
      """WITH r AS (
        |  SELECT user_id, event_type AS item,
        |         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS r_milli,
        |         CAST(1000 AS BIGINT) AS v0
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id,
        |             sum(r_milli * v0) // (sum(v0 * v0) // 1000) AS u_milli
        |      FROM r GROUP BY user_id),
        |ru AS (SELECT r.item, r.r_milli, u.u_milli
        |       FROM r JOIN u USING (user_id)),
        |v1 AS (SELECT item,
        |              sum(r_milli * u_milli) // (sum(u_milli * u_milli) // 1000) AS v1_milli
        |       FROM ru GROUP BY item)
        |SELECT ru.item, count(*) AS n_ratings,
        |       CAST(max(v1.v1_milli) AS BIGINT) AS v1_milli,
        |       CAST(sum((ru.r_milli - ru.u_milli * v1.v1_milli // 1000)
        |                * (ru.r_milli - ru.u_milli * v1.v1_milli // 1000)) AS BIGINT) AS sse_milli2
        |FROM ru JOIN v1 USING (item)
        |GROUP BY ru.item
        |ORDER BY ru.item""".stripMargin
  )
}
