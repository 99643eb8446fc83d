package graft.ml

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, IDF, MinHashLSH, Tokenizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Thin MLlib reuse wrappers (SURVEY.md §7.1 step 7): the library paths for
  * dedup / similarity / text featurization at scale, cross-checked in
  * ScalaTests against the hand-built sketch queries (MLlib hash families
  * differ, so parity is behavioral — recall on known near-dups — not
  * hash equality).
  */
object Pipelines {

  /** documents -> sparse term-frequency vectors (tokenize + hash). */
  def termVectors(spark: SparkSession, sfDir: String, numFeatures: Int = 1 << 12): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf").setNumFeatures(numFeatures)
    tf.transform(tok.transform(docs))
  }

  /** TF-IDF features over documents. */
  def tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = termVectors(spark, sfDir)
    new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tf).transform(tf)
  }

  /** MLlib MinHashLSH near-dup join on term-set vectors: returns candidate
    * (doc_a, doc_b, jaccardDistance) pairs under `maxDistance`.
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String,
                      maxDistance: Double = 0.5): DataFrame = {
    val tf = termVectors(spark, sfDir)
    val mh = new MinHashLSH().setInputCol("tf").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(tf)
    model.approxSimilarityJoin(tf, tf, maxDistance, "jaccard_dist")
      .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"),
        col("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** MLlib random-projection LSH ANN over the embeddings: top-k approximate
    * neighbors of a probe vector (the MLlib counterpart of q_ann_ivf).
    */
  def annNeighbors(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val probe = emb.orderBy("vec_id").limit(1).head().getAs[org.apache.spark.ml.linalg.Vector]("features")
    val lsh = new BucketedRandomProjectionLSH().setInputCol("features")
      .setOutputCol("hashes").setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
    lsh.fit(emb).approxNearestNeighbors(emb, probe, k)
      .select(col("vec_id"), col("distCol").as("dist"))
  }
}
