package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composite promread read path — matchers, time range, routing,
    * sample values, labels, ordering — is the engine's signature operation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_read_path")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.MetricsQueries.queries ++
      graft.queries.LlmQueries.queries ++ graft.queries.HistoQueries.queries ++
      graft.queries.SinkQueries.queries ++ graft.queries.IngestQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++ graft.queries.MetricsQueries.oracles ++
      graft.queries.LlmQueries.oracles ++ graft.queries.HistoQueries.oracles ++
      graft.queries.SinkQueries.oracles ++ graft.queries.IngestQueries.oracles
}
