package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and their DuckDB oracles live in graft.queries.*; this object is
  * just the stable façade the driver harness calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a weaker rows-only check.
    *
    * The flatten strips `--` line comments FIRST: collapsing newlines would
    * otherwise let a comment swallow the rest of the query (DuckDB then
    * fails with "syntax error at end of input"). Consequence: `--` must
    * not appear inside oracle string literals — use chr(45) twice if one
    * is ever genuinely needed.
    */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (name, q) if q.oracle.isDefined =>
      name -> q.oracle.get.linesIterator
        .map(_.replaceAll("--.*$", "").trim)
        .filter(_.nonEmpty).mkString(" ")
    }
}
