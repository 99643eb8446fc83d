package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Statistical-evaluation operators: distribution comparison (KS), ranking
  * quality (AUC), categorical independence (chi-square), robust location /
  * spread (median+MAD), and multi-objective dominance (skyline).
  *
  * These are the model-eval / drift-detection queries a training-data
  * pipeline runs beside its prep jobs (reference scope: the K-Means repo's
  * convergence checks, master.py:115-152, are this family's simplest
  * member — a scalar statistic over the full dataset per pass).
  *
  * Scale design, shared by all five: every query first REDUCES the input to
  * a bounded intermediate (per-group aggregates, per-distinct-value counts,
  * or fixed-width bins) with one map-side-combinable shuffle, and only then
  * applies the sequential statistic (cumulative window / ordered fold) on
  * the reduced frame. The unpartitioned windows below therefore run over
  * bins/distinct-value groups, never over raw rows — at 100 TB the window
  * input is O(bins) or O(|value domain|), not O(N). For genuinely unbounded
  * domains the binned variants (q_ks_test) are the scale path; the
  * distinct-value variants (q_auc, q_skyline) document their domain bound.
  */
object StatsQueries {

  /** KS price-bin width: 1000 currency units → ≤~600 bins over the fixture
    * price range at any sf (o_totalprice is bounded by the generator's part
    * price × quantity envelope, not by row count).
    */
  val KsBinWidth = 1000.0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: robust per-group location+spread — exact median and MAD (median
    // absolute deviation) of quantity per returnflag. Two passes: group
    // medians (percentile over the bounded quantity domain: Spark's exact
    // percentile keeps a value→count map per group, fine for integral
    // quantities 1..50; use q_quantiles_approx for unbounded domains), then
    // deviations join the 3-row median frame back via broadcast.
    "q_median_mad" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val med = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(max("med"), 6).as("med"),
          round(expr("percentile(abs(l_quantity - med), 0.5)"), 6).as("mad"))
        .orderBy("l_returnflag")
    },

    // NS: chi-square independence test between customer segment and order
    // priority. The raw join reduces to a 5x5 contingency table in one
    // map-side-combinable aggregation; marginals and the statistic are
    // window sums over those 25 rows (driver-scale frame regardless of N).
    // The customer join carries NO broadcast hint: customer scales with
    // the corpus (a TPC-H-shaped customer at 100 TB is billions of rows)
    // — AQE broadcasts at fixture scale, shuffle-joins on the key beyond.
    "q_chi_square" -> { (s, dir) =>
      val ct = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).cast("double").as("obs"))
      val tot = ct
        .withColumn("rt", sum("obs").over(Window.partitionBy("seg")))
        .withColumn("ctot", sum("obs").over(Window.partitionBy("pri")))
        .withColumn("n", sum("obs").over(Window.partitionBy()))
      val exp_ = col("rt") * col("ctot") / col("n")
      tot.agg(
          max("n").cast("long").as("n"),
          round(sum((col("obs") - exp_) * (col("obs") - exp_) / exp_), 6).as("chi2"),
          ((countDistinct("seg") - 1) * (countDistinct("pri") - 1)).as("dof"))
    },

    // NS: two-sample Kolmogorov–Smirnov distance between the price
    // distributions of F vs O orders, on fixed-width bins. Binning is the
    // 100 TB design: the one shuffle carries ≤~600 (bin, side-counts) rows,
    // the ECDF walk is a window over that tiny frame, and the answer is
    // exact for the binned statistic (error vs continuous KS ≤ the bin's
    // probability mass — a knob, not a surprise).
    "q_ks_test" -> { (s, dir) =>
      val b = Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(floor(col("o_totalprice") / KsBinWidth).cast("long").as("bin"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("f"),
          when(col("o_orderstatus") === "O", 1L).otherwise(0L).as("o"))
        .groupBy("bin").agg(sum("f").as("nf"), sum("o").as("no_"))
      val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = b
        .withColumn("cf", sum("nf").over(w))
        .withColumn("co", sum("no_").over(w))
        .withColumn("tf", sum("nf").over(Window.partitionBy()))
        .withColumn("tn", sum("no_").over(Window.partitionBy()))
      c.agg(max("tf").cast("long").as("n_f"),
          max("tn").cast("long").as("n_o"),
          round(max(abs(col("cf").cast("double") / col("tf") -
            col("co").cast("double") / col("tn"))), 6).as("ks"))
    },

    // NS: ROC AUC of price as a predictor of final-status orders, via the
    // Mann–Whitney rank-sum with tie correction — computed EXACTLY in
    // integer arithmetic (2U = Σ np·(2·cum_neg_below + nn)), so no
    // float-summation-order hazard; the lone division happens once at the
    // end. Input reduces to per-distinct-score counts first (prices are
    // 2-decimal: the domain, not N, bounds the window frame). decimal(38)
    // keeps 2U exact far past the long range (P·N at petabyte row counts).
    "q_auc" -> { (s, dir) =>
      val g = Tables.orders(s, dir)
        .select(col("o_totalprice").as("score"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"))
        .groupBy("score")
        .agg(sum("pos").as("np"), sum(lit(1L) - col("pos")).as("nn"))
      val w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
      val c = g.withColumn("cnb", coalesce(sum("nn").over(w), lit(0L)))
      c.agg(sum("np").cast("long").as("n_pos"),
          sum("nn").cast("long").as("n_neg"),
          round(sum((col("np") * (lit(2) * col("cnb") + col("nn"))).cast("decimal(38,0)"))
              .cast("double") /
            (lit(2.0) * sum("np").cast("double") * sum("nn").cast("double")), 6).as("auc"))
    },

    // NS: 2-D skyline (Pareto frontier): lineitems minimizing price while
    // maximizing quantity — no other line is both cheaper and larger.
    // Two-level staircase, because the distinct-price frame is NOT small
    // (~N at this generator): level 1 collapses to max-qty per 1000-wide
    // price bucket (one small agg), runs the strictly-earlier-bucket
    // running max over those ~500 rows, and broadcasts it back; only rows
    // that beat every earlier bucket's max survive to the exact
    // single-partition staircase — provably the same frontier (a dropped
    // row is dominated by the earlier-bucket row that set the running max,
    // which itself survives), with the global window seeing ~1e2-1e3
    // candidates instead of ~N distinct prices. This two-level
    // prefilter+exact shape is the 100 TB form of every "global ordered
    // scan" operator.
    "q_skyline" -> { (s, dir) =>
      val g = Tables.lineitem(s, dir)
        .groupBy(col("l_extendedprice").as("price"))
        .agg(max("l_quantity").as("qty"))
      val wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
      val bmax = g.groupBy(floor(col("price") / 1000.0).cast("long").as("bkt"))
        .agg(max("qty").as("bqty"))
        .withColumn("bprev", max("bqty").over(wb))
        .select(col("bkt"), col("bprev"))
      val cand = g
        .withColumn("bkt", floor(col("price") / 1000.0).cast("long"))
        .join(broadcast(bmax), "bkt")
        .filter(col("bprev").isNull || col("qty") > col("bprev"))
      val w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
      cand.withColumn("prevmax", max("qty").over(w))
        .filter(col("prevmax").isNull || col("qty") > col("prevmax"))
        .select("price", "qty")
        .orderBy("price")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_median_mad" ->
      """WITH m AS (SELECT l_returnflag, median(l_quantity) AS med FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n, round(max(m.med), 6) AS med,
        |       round(median(abs(l.l_quantity - m.med)), 6) AS mad
        |FROM lineitem l JOIN m USING (l_returnflag)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_chi_square" ->
      """WITH ct AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri, count(*)::DOUBLE AS obs
        |            FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |tot AS (SELECT seg, pri, obs,
        |               sum(obs) OVER (PARTITION BY seg) AS rt,
        |               sum(obs) OVER (PARTITION BY pri) AS ctot,
        |               sum(obs) OVER () AS n FROM ct)
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |       round(sum((obs - rt*ctot/n)*(obs - rt*ctot/n)/(rt*ctot/n)), 6) AS chi2,
        |       (count(DISTINCT seg)-1)*(count(DISTINCT pri)-1) AS dof
        |FROM tot""".stripMargin,
    "q_ks_test" ->
      s"""WITH b AS (SELECT CAST(floor(o_totalprice / $KsBinWidth) AS BIGINT) AS bin,
         |                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f,
         |                  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS o
         |           FROM orders WHERE o_orderstatus IN ('F', 'O')),
         |pb AS (SELECT bin, sum(f) AS nf, sum(o) AS no_ FROM b GROUP BY 1),
         |c AS (SELECT bin,
         |             sum(nf) OVER (ORDER BY bin) AS cf,
         |             sum(no_) OVER (ORDER BY bin) AS co,
         |             (SELECT sum(nf) FROM pb) AS tf,
         |             (SELECT sum(no_) FROM pb) AS tn FROM pb)
         |SELECT CAST(max(tf) AS BIGINT) AS n_f, CAST(max(tn) AS BIGINT) AS n_o,
         |       round(max(abs(cf::DOUBLE/tf - co::DOUBLE/tn)), 6) AS ks
         |FROM c""".stripMargin,
    "q_auc" ->
      """WITH s AS (SELECT o_totalprice AS score,
        |                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos FROM orders),
        |g AS (SELECT score, CAST(sum(pos) AS BIGINT) AS np, CAST(sum(1 - pos) AS BIGINT) AS nn
        |      FROM s GROUP BY 1),
        |c AS (SELECT np, nn,
        |             coalesce(sum(nn) OVER (ORDER BY score
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
        |      FROM g)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
        |       round(CAST(sum(np * (2*cnb + nn)) AS DOUBLE) / (2.0 * sum(np) * sum(nn)), 6) AS auc
        |FROM c""".stripMargin,
    "q_skyline" ->
      """WITH g AS (SELECT l_extendedprice AS price, max(l_quantity) AS qty
        |           FROM lineitem GROUP BY 1),
        |w AS (SELECT price, qty,
        |             max(qty) OVER (ORDER BY price
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |      FROM g)
        |SELECT price, qty FROM w WHERE prevmax IS NULL OR qty > prevmax
        |ORDER BY price""".stripMargin
  )
}
