package graft.queries

/** Shared constants between the Spark queries and their DuckDB oracle SQL.
  *
  * The driver compares Spark parquet output against DuckDB running
  * [[graft.SparkEntry.oracleSql]] over the same parquet tables, hashing values
  * after sorting columns by name — so every query/oracle pair aliases columns
  * identically and orders rows identically.
  */
object OracleDefs {

  /** Pinned "now" for every wall-clock-relative rule (validation bounds,
    * TTL stamping, resolution routing): 2024-01-24T00:00:00Z — inside the
    * events table's Jan-2024 span so age-based branches all get exercised.
    * ms-epoch, identical literal on both sides. */
  val NowMs: Long = 1706054400000L

  val HourMs: Long = 3600L * 1000
  val DayMs: Long = 24 * HourMs

  /** The canonical events→metrics view (Spark twin:
    * [[graft.metrics.EventsMetrics.fromEvents]]). ns→ms epoch flooring is
    * engine-stable (Spark reads µs-truncated, both floor to ms). */
  val EvtCte: String =
    """WITH evt AS (
      |  SELECT event_id,
      |         epoch_ms(ts) AS ts_ms,
      |         'ws-' || CAST(user_id % 4 AS VARCHAR) AS workspace_id,
      |         'evt_' || event_type AS metric,
      |         'svc-' || CAST(user_id % 3 AS VARCHAR) AS service_name,
      |         user_id, event_type, value, props
      |  FROM events
      |)""".stripMargin

  /** Stopwords shared by the text-analysis queries. */
  val Stopwords: Seq[String] = Seq("the", "a")
}
