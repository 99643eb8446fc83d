package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark session startup dominates
  * test wall time otherwise). Suites needing special confs (fault injection)
  * build their own.
  */
object TestSpark {
  // local[4, 3]: 4 threads, task maxFailures=3 — so FaultToleranceSpec can
  // exercise retries on the same shared context.
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.plans.GraftExtensions)
    .master("local[4, 3]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config(graft.core.Tables.NanosAsLongConf._1, graft.core.Tables.NanosAsLongConf._2)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "target/warehouse")
    .getOrCreate()

  val Sf0001 = "/root/testdata/sf0.001"

  /** Larger fixture used only by data-scale-sensitive specs; callers must
    * `assume(new java.io.File(TestSpark.Sf01).exists)` so the suite stays
    * green on machines without the big fixture.
    */
  val Sf01 = "/root/testdata/sf0.1"

  /** The reference's own 20-point 2-D sample
    * (/root/reference/Data/Input/points.txt:1-20), replayed for exact
    * semantics parity (FIXTURES.md A4).
    */
  val refPoints: Seq[(Long, Array[Double])] = Seq(
    (0L, Array(2.4253966361924117, 14.200140998826638)),
    (1L, Array(81.430136979439, 50.33034624768575)),
    (2L, Array(12.630863179096908, 96.83125993903082)),
    (3L, Array(85.32433236307622, 38.85085293948647)),
    (4L, Array(10.948801251154682, 63.84346297199029)),
    (5L, Array(81.15927937347692, 57.750360036814705)),
    (6L, Array(31.557122052707076, 36.90041258086754)),
    (7L, Array(46.66353476332117, 42.536829675995506)),
    (8L, Array(30.2214411954406, 60.63826278594955)),
    (9L, Array(15.256211095947226, 62.08885022713485)),
    (10L, Array(65.92469227195072, 51.192695664924834)),
    (11L, Array(22.918984884832927, 86.29388886815464)),
    (12L, Array(37.59627649460666, 83.10255966867024)),
    (13L, Array(88.28421977908025, 12.067049557489574)),
    (14L, Array(41.94706427555632, 76.82403075144262)),
    (15L, Array(2.552573964893323, 17.536987084919097)),
    (16L, Array(24.281737705586114, 48.02641007037477)),
    (17L, Array(14.536067497498816, 51.3905894486027)),
    (18L, Array(12.289008223892928, 76.22457846480101)),
    (19L, Array(30.934672692775134, 62.34121834917595)))

  def refPointsDf = {
    val s = spark
    import s.implicits._
    refPoints.toDF("vec_id", "coordinates")
  }
}
