package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.text.TextQueries

/** Sketch-backed pruning operators (north-star scale surface): an explicit
  * blocked Bloom filter built from a join's dim side and probed on the
  * fact side BEFORE any shuffle — the user-level twin of Spark's runtime
  * row-level filtering, with the false-positive rate surfaced as a
  * queryable number instead of a config knob.
  *
  * Scale notes: the filter is `BloomWords` longs (a few KB) built by one
  * map-side-combinable `bit_or` aggregate over the dim keys and broadcast
  * to every fact partition; the fact side is filtered in a narrow map
  * stage. At 100 TB this is exactly the shape that makes a selective
  * dim⋈fact join cheap: the 98%+ of fact rows that cannot match never
  * enter the join shuffle. All hashing is the cross-engine md5-substring
  * pattern ([[TextQueries.h32]]) so DuckDB rebuilds bit-identical words.
  */
object SketchQueries {

  /** 64-bit words in the filter (64 × 62 usable bits ≈ 4 Kbit). */
  val BloomWords = 64

  /** Bits usable per word — capped at 62 to keep `1 << p` strictly
    * positive in both engines (bit 63 is the sign bit; DuckDB raises on
    * BIGINT shift overflow edge cases Spark wraps silently).
    */
  val BitsPerWord = 62

  private def h(tag: String, k: Column): Column =
    TextQueries.h32(concat(lit(tag), k.cast("string")))

  private def word(k: Column): Column = pmod(h("bw:", k), lit(BloomWords.toLong))

  /** Two-bit mask from the in-scope `p1`/`p2` bit-position columns. */
  private def mask: Column =
    expr("shiftleft(CAST(1 AS BIGINT), CAST(p1 AS INT)) | shiftleft(CAST(1 AS BIGINT), CAST(p2 AS INT))")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: bloom-pruned semi join — BUILDING-segment customers are the dim;
    // orders probe the filter (2 hash bits in 1 word — a blocked bloom, one
    // cache line per probe), then the exact semi join measures what the
    // sketch let through: per order status, candidates vs true matches vs
    // false positives. The invariant pass ⊇ truth (no false negatives) is
    // what the oracle equivalence certifies; the fp rate is the quality
    // dial (k bits, filter size) made queryable.
    "q_bloom_prune" -> { (s, dir) =>
      val dim = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val bloom = dim
        .select(word(col("k")).as("w"),
          pmod(h("b1:", col("k")), lit(BitsPerWord.toLong)).as("p1"),
          pmod(h("b2:", col("k")), lit(BitsPerWord.toLong)).as("p2"))
        .select(col("w"), mask.as("b"))
        .groupBy("w").agg(expr("bit_or(b)").as("bloom"))
      val probed = Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_custkey"))
        .withColumn("w", word(col("o_custkey")))
        .withColumn("p1", pmod(h("b1:", col("o_custkey")), lit(BitsPerWord.toLong)))
        .withColumn("p2", pmod(h("b2:", col("o_custkey")), lit(BitsPerWord.toLong)))
        .join(broadcast(bloom), Seq("w"), "left_outer")
        .withColumn("pass",
          (col("bloom").isNotNull && col("bloom").bitwiseAND(mask) === mask)
            .cast("long"))
        .join(broadcast(dim.withColumn("truth", lit(1L))),
          col("o_custkey") === col("k"), "left_outer")
        .withColumn("truth", coalesce(col("truth"), lit(0L)))
      probed.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum("pass").as("n_bloom_pass"),
          sum("truth").as("n_true"),
          sum(col("pass") * (lit(1L) - col("truth"))).as("n_false_pos"),
          round(sum(col("pass") * (lit(1L) - col("truth"))).cast("double") /
            greatest(count(lit(1)) - sum("truth"), lit(1L)).cast("double"), 6)
            .as("fp_rate"))
        .orderBy("o_orderstatus")
    },

    // NS: exact heavy hitters via sketch + recount — the Misra–Gries
    // Aggregator generates a ≤64-entry candidate map (partition-local
    // sketches, k-entry maps merge — the full tokenized corpus never
    // shuffles), the candidates broadcast back for an exact recount, and
    // the n/30 threshold cut makes the output EXACT (MG guarantees the
    // candidate set is a superset of everything above n/(k+1)) — so the
    // plain groupBy-HAVING oracle certifies the sketch path end to end.
    "q_heavy_hitters" -> { (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
      val cand = words.agg(graft.functions.MisraGriesAgg(col("word")).as("mg"))
        .select(explode(map_keys(col("mg"))).as("word"))
      val total = words.agg(count(lit(1)).as("n_total"))
      words.join(broadcast(cand), "word")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") * lit(30L) > col("n_total"))
        .select(col("word"), col("cnt"), col("n_total"))
        .orderBy("word")
    }
  )

  def oracleSql: Map[String, String] = {
    def h(tag: String, k: String): String =
      s"('0x' || substr(md5('$tag' || CAST($k AS VARCHAR)), 1, 8))::BIGINT"
    Map(
      "q_bloom_prune" ->
        s"""WITH dim AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
           |db AS (SELECT ${h("bw:", "k")} % $BloomWords AS w,
           |              (CAST(1 AS BIGINT) << CAST(${h("b1:", "k")} % $BitsPerWord AS INT)) |
           |              (CAST(1 AS BIGINT) << CAST(${h("b2:", "k")} % $BitsPerWord AS INT)) AS b
           |       FROM dim),
           |bloom AS (SELECT w, bit_or(b) AS bloom FROM db GROUP BY w),
           |probe AS (SELECT o_orderstatus, o_custkey,
           |                 ${h("bw:", "o_custkey")} % $BloomWords AS w,
           |                 (CAST(1 AS BIGINT) << CAST(${h("b1:", "o_custkey")} % $BitsPerWord AS INT)) |
           |                 (CAST(1 AS BIGINT) << CAST(${h("b2:", "o_custkey")} % $BitsPerWord AS INT)) AS b
           |          FROM orders),
           |flags AS (SELECT p.o_orderstatus,
           |                 CASE WHEN bl.bloom IS NOT NULL AND (bl.bloom & p.b) = p.b
           |                      THEN 1 ELSE 0 END AS pass,
           |                 CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END AS truth
           |          FROM probe p
           |          LEFT JOIN bloom bl USING (w)
           |          LEFT JOIN dim d ON d.k = p.o_custkey)
           |SELECT o_orderstatus,
           |       count(*) AS n_orders,
           |       CAST(sum(pass) AS BIGINT) AS n_bloom_pass,
           |       CAST(sum(truth) AS BIGINT) AS n_true,
           |       CAST(sum(pass * (1 - truth)) AS BIGINT) AS n_false_pos,
           |       round(CAST(sum(pass * (1 - truth)) AS DOUBLE) /
           |             CAST(greatest(count(*) - sum(truth), 1) AS DOUBLE), 6) AS fp_rate
           |FROM flags GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      // exact heavy hitters: the sketch+recount plan must equal the plain
      // full groupBy with a HAVING threshold
      "q_heavy_hitters" ->
        """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
          |t AS (SELECT count(*) AS n_total FROM w)
          |SELECT word, count(*) AS cnt, t.n_total AS n_total
          |FROM w CROSS JOIN t
          |GROUP BY word, t.n_total
          |HAVING count(*) * 30 > t.n_total
          |ORDER BY word""".stripMargin
    )
  }
}
