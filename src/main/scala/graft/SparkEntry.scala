package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`/`oracleSql` aggregate the per-module surfaces; every key in
  * `oracleSql` must exist in `queries` and produce hash-identical output to
  * the DuckDB SQL run on the same parquet tables (columns sorted by name,
  * so aliases match exactly on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * one full Lloyd iteration of the K-Means dataflow (SURVEY.md §2.11).
    */
  def entry(spark: SparkSession): DataFrame =
    kmeans.KmeansQueries.queries("q_kmeans_iter1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    kmeans.KmeansQueries.queries ++
      _root_.graft.queries.RelationalQueries.queries ++
      _root_.graft.queries.TpchDerived.queries ++
      _root_.graft.queries.WindowSetQueries.queries ++
      _root_.graft.queries.ScalarQueries.queries ++
      _root_.graft.queries.DataPrepQueries.queries ++
      _root_.graft.queries.TimeSeriesQueries.queries ++
      _root_.graft.queries.SketchQueries.queries ++
      _root_.graft.queries.StatsQueries.queries ++
      _root_.graft.queries.EvalMetricsQueries.queries ++
      _root_.graft.queries.QualityQueries.queries ++
      streaming.EventQueries.queries ++
      text.TextQueries.queries ++
      text.CorpusQueries.queries ++
      text.CorpusStatsQueries.queries ++
      text.PackingQueries.queries ++
      text.RetrievalQueries.queries ++
      text.GraphQueries.queries ++
      sim.SimilarityQueries.queries ++
      sim.SpatialQueries.queries ++
      multimodal.BlobQueries.queries ++
      ml.MLQueries.queries ++
      ml.TrainQueries.queries ++
      core.Sinks.queries ++
      sources.TimeTravel.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    kmeans.KmeansQueries.oracleSql ++
      _root_.graft.queries.RelationalQueries.oracleSql ++
      _root_.graft.queries.TpchDerived.oracleSql ++
      _root_.graft.queries.WindowSetQueries.oracleSql ++
      _root_.graft.queries.ScalarQueries.oracleSql ++
      _root_.graft.queries.DataPrepQueries.oracleSql ++
      _root_.graft.queries.TimeSeriesQueries.oracleSql ++
      _root_.graft.queries.SketchQueries.oracleSql ++
      _root_.graft.queries.StatsQueries.oracleSql ++
      _root_.graft.queries.EvalMetricsQueries.oracleSql ++
      _root_.graft.queries.QualityQueries.oracleSql ++
      streaming.EventQueries.oracleSql ++
      text.TextQueries.oracleSql ++
      text.CorpusQueries.oracleSql ++
      text.CorpusStatsQueries.oracleSql ++
      text.PackingQueries.oracleSql ++
      text.RetrievalQueries.oracleSql ++
      text.GraphQueries.oracleSql ++
      sim.SimilarityQueries.oracleSql ++
      sim.SpatialQueries.oracleSql ++
      multimodal.BlobQueries.oracleSql ++
      ml.MLQueries.oracleSql ++
      ml.TrainQueries.oracleSql ++
      core.Sinks.oracleSql ++
      sources.TimeTravel.oracleSql
}
