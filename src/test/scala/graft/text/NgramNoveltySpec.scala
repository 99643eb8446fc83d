package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables

/** q_ngram_novelty (boilerplate ratio) and q_observe_metrics invariants. */
class NgramNoveltySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("novelty rows: n_shared <= n_shingles, ratio consistent, coverage = docs with >=3 words") {
    val got = TextQueries.queries("q_ngram_novelty")(spark, TestSpark.Sf0001)
    val rows = got.collect()
    rows.foreach { r =>
      val (n, sh, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(sh >= 0 && sh <= n)
      assert(math.abs(ratio - BigDecimal(sh.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    val expectedDocs = Tables.documents(spark, TestSpark.Sf0001)
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(rows.length == expectedDocs)
  }

  test("memoized shingle path equals a direct derivation of n_shared totals") {
    val got = TextQueries.queries("q_ngram_novelty")(spark, TestSpark.Sf0001)
      .agg(sum("n_shingles"), sum("n_shared")).head()
    // direct spelling, no memo: shingles from scratch, df via self-count
    val sh = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"),
        explode(array_distinct(TextQueries.shingles3(split(col("text"), " ")))).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("n_docs"))
    val direct = sh.join(df, "sh")
      .agg(count(lit(1)).as("t_shingles"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("t_shared")).head()
    assert(got.getLong(0) == direct.getLong(0) && got.getLong(1) == direct.getLong(1))
  }

  test("observe() metrics equal direct aggregates") {
    val got = graft.queries.RelationalQueries.queries("q_observe_metrics")(
      spark, TestSpark.Sf0001).head()
    val direct = Tables.lineitem(spark, TestSpark.Sf0001)
      .agg(count(lit(1)), sum("l_quantity"), max("l_extendedprice")).head()
    assert(got.getLong(0) == direct.getLong(0))
    assert(got.getDouble(1) == direct.getDouble(1))
    assert(got.getDouble(2) == direct.getDouble(2))
  }
}
