package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark program plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL run by the driver's correctness harness.
  * Column names/aliases must match between the two — the driver sorts columns
  * by name before hashing.
  */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None)

object Registry {
  /** All registered operator queries, keyed by stable name. */
  def all: Map[String, Q] =
    RelationalQueries.qs ++ FunctionQueries.qs ++ WritePathQueries.qs ++
      ExtensionQueries.qs ++ CurationQueries.qs ++ EndpointQueries.qs ++
      CdcQueries.qs
}
