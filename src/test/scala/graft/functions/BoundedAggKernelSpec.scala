package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the bounded-aggregate kernels after the r10 O(1)
  * steady-state rewrite: every (reduce*, merge*) composition must equal the
  * naive specification — "sort everything seen, take k, dedup where the
  * contract says distinct" — including tie behavior at the k boundary
  * (incumbents survive, matching the old stable `sortBy(b :+ a)` form the
  * oracle hashes were certified against). Seeded randomness: 500 dense
  * cases per kernel (domains chosen so duplicates and exact ties are
  * frequent), reproducible on failure via the printed seed/case index.
  */
class BoundedAggKernelSpec extends AnyFunSuite {
  private val Cases = 500

  test("BottomKDistinctAgg: any reduce/merge composition == sorted distinct take k") {
    val rnd = new Random(0xB07706L)
    for (i <- 1 to Cases) {
      val k = 1 + rnd.nextInt(9)
      val xs = List.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong - 30)
      val ys = List.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong - 30)
      val agg = new BottomKDistinctAgg(k)
      val merged = agg.finish(agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce)))
      val expected = (xs ++ ys).distinct.sorted.take(k)
      assert(merged == expected, s"case $i k=$k xs=$xs ys=$ys")
    }
  }

  test("BottomKDistinctAgg: full-long-domain fold equals the spec at k=128") {
    val rnd = new Random(0x128128L)
    for (i <- 1 to 50) {
      val xs = List.fill(rnd.nextInt(600))(rnd.nextLong())
      val agg = new BottomKDistinctAgg(128)
      val folded = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(folded == xs.distinct.sorted.take(128), s"case $i")
    }
  }

  test("TopKAgg: reduce/merge == stable sort by (sim desc, id asc) take k") {
    val rnd = new Random(0x70AA6L)
    val sims = Array(0.0, 0.25, 0.5, 0.75, 1.0) // forced sim ties
    for (i <- 1 to Cases) {
      val k = 1 + rnd.nextInt(7)
      def gen() = List.fill(rnd.nextInt(30))(
        ScoredId(rnd.nextInt(30).toLong, sims(rnd.nextInt(sims.length))))
      val (xs, ys) = (gen(), gen())
      val agg = new TopKAgg(k)
      val merged = agg.finish(agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce)))
      val expected = (xs ++ ys).sortBy(x => (-x.sim, x.id)).take(k)
      assert(merged == expected, s"case $i k=$k xs=$xs ys=$ys")
    }
  }

  test("TopKTermAgg: reduce/merge == stable sort by (z desc, y desc, term asc) take k") {
    val rnd = new Random(0x7E57L)
    val zs = Array(-1.0, 0.0, 1.0)
    val ts = Array("a", "b", "c", "d")
    for (i <- 1 to Cases) {
      val k = 1 + rnd.nextInt(5)
      def gen() = List.fill(rnd.nextInt(25))(ScoredTerm(
        zs(rnd.nextInt(zs.length)), rnd.nextInt(4).toLong, ts(rnd.nextInt(ts.length))))
      val (xs, ys) = (gen(), gen())
      val agg = new TopKTermAgg(k)
      val merged = agg.finish(agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce)))
      val expected = (xs ++ ys).sortBy(x => (-x.z, -x.y, x.term)).take(k)
      assert(merged == expected, s"case $i k=$k xs=$xs ys=$ys")
    }
  }
}
