package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10x stress-fixture generator (round-7 verdict item 3).
  *
  * The driver provides fixtures up to sf0.1 only; the domain-bounded
  * assumptions in the query surface (percentile value->count maps, bloom
  * bit census, histogram DIV bucketing, CC round counts, memo cold-build
  * cost) are exactly the class of design decision that breaks at the next
  * data decade, so we synthesize a local sf1 by unioning sf0.1 with
  * id-shifted replicas and run the FULL oracle gate + bench against it.
  *
  * Construction: replica r in [0, R) shifts every 64-bit key column by
  * r * Stride, consistently across each foreign-key domain (o_custkey
  * moves with c_custkey, l_orderkey with o_orderkey, events.user_id with
  * c_custkey — the streaming joins use user_id = c_custkey). Replica 0 is
  * the identity, so the base fixture embeds unchanged. The bounded dims
  * (region, nation) are NOT replicated — real scale-ups grow facts, not
  * the country list — and all non-key content (text, timestamps, prices,
  * embeddings) replicates verbatim. That makes the synthetic sf1 a
  * deliberately duplicate-heavy corpus: every document gains R-1 exact
  * copies and every embedding R-1 identical neighbors, which is the worst
  * case the dedup/ANN/SemDeDup guards claim to survive (mega-clusters,
  * hot LSH buckets, dense CC cliques) — precisely what this fixture is
  * for. Key census per table is printed so a stride collision with base
  * ids would be visible immediately (base max keys are ~1.5e5; Stride is
  * 1e7, four orders above, and R*Stride ~ 1e8 stays far inside int64).
  *
  * Usage: runMain graft.tools.StressGen [baseDir] [outDir] [replicas]
  * Dev/bench tooling — not part of the query surface.
  */
object StressGen {

  /** Key shift per replica; >> any base key (max base key ~6e5 at sf0.1). */
  val Stride = 10_000_000L

  /** Per-table 64-bit key columns sharing a shift domain with their FKs. */
  val KeyCols: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )

  def replicate(df: DataFrame, keyCols: Seq[String], replicas: Int): DataFrame = {
    val withR = df.withColumn("__r", explode(sequence(lit(0L), lit(replicas - 1L))))
    keyCols.foldLeft(withR) { (d, c) =>
      d.withColumn(c, col(c) + col("__r") * lit(Stride))
    }.drop("__r")
  }

  /** Write `df` as ONE parquet FILE at `dest` — the driver fixture layout
    * (`<table>.parquet` is a file, not a directory). The file streams rely
    * on this: `Streams.readEvents` globs the LEAF name `events.parquet`
    * under the sf dir, so a directory-per-table layout streams zero files
    * (found the hard way: every q_stream_* saw an empty stream on the
    * first directory-layout draft of this generator). Parallelism inside
    * the single file comes from row groups: block size is forced down to
    * 8 MiB so a ~100 MB lineitem file carries ~12 independently scannable
    * row groups instead of one.
    */
  private def writeSingleFile(df: DataFrame, tmpDir: String, dest: String): Unit = {
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (8 * 1024 * 1024).toString)
      .parquet(tmpDir)
    val part = new java.io.File(tmpDir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $tmpDir"))
    val destFile = new java.io.File(dest)
    if (destFile.isDirectory) destFile.listFiles().foreach(_.delete())
    destFile.delete()
    java.nio.file.Files.move(part.toPath, destFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(tmpDir).listFiles().foreach(_.delete())
    new java.io.File(tmpDir).delete()
  }

  def main(args: Array[String]): Unit = {
    val baseDir  = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir   = if (args.length > 1) args(1) else "target/stress_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.Tables.NanosAsLongConf._1, graft.core.Tables.NanosAsLongConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      // raw read (not Tables.events' ts normalizer): the on-disk encoding
      // must round-trip so the synthetic dir obeys the same fixture
      // contract the loaders dispatch on
      val base = spark.read.parquet(s"$baseDir/$t.parquet")
      val out = KeyCols.get(t) match {
        case Some(keys) => replicate(base, keys, replicas)
        case None       => base // bounded dims copy once
      }
      writeSingleFile(out, s"$outDir/_tmp_$t", s"$outDir/$t.parquet")
      val written = spark.read.parquet(s"$outDir/$t.parquet")
      val census = KeyCols.get(t).flatMap(_.headOption) match {
        case Some(k) =>
          val r = written.agg(count(lit(1)), min(col(k)), max(col(k))).head()
          f"rows=${r.getLong(0)}%d ${k}=[${r.get(1)}, ${r.get(2)}]"
        case None => s"rows=${written.count()}"
      }
      System.err.println(s"[stressgen] $t $census")
    }
    spark.stop()
  }
}
