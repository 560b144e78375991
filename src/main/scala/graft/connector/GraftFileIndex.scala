package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** File index for catalog READS with manifest-stats dir pruning — the
  * Delta `TahoeFileIndex` pattern: Spark's planner hands the pushed data
  * filters to `listFiles`, and files living in a dir whose committed
  * [[DirStats]] prove no row can match are dropped from the scan BEFORE
  * tasks are planned. A point `SELECT ... WHERE k = x` on a thousand-dir
  * table then plans tasks for the one dir whose range contains `x`; the
  * delegated parquet reader's row-group pruning remains the second layer
  * inside kept dirs.
  *
  * Strictly a planning optimization: pruning is conservative (statless
  * dirs, unknown columns, and untranslatable filters always stay), and the
  * same filters are still evaluated by the parquet reader and the query,
  * so a missed prune costs IO, never rows. Unlike the copy-on-write scan
  * ([[GraftCowScan]]), dropping unmatched data here is CORRECT — a read
  * never rewrites what it did not scan.
  */
private[connector] class GraftFileIndex(spark: SparkSession,
                                        entries: Seq[DirEntry],
                                        schema: StructType)
    extends InMemoryFileIndex(spark, entries.map(e => new Path(e.dir)),
      Map.empty[String, String], Some(schema)) {

  /** Stats keyed by the qualified dir path, as listed files report it.
    * All dirs live under one table root, so one FileSystem lookup suffices.
    */
  private lazy val statsByDir: Map[String, Option[DirStats]] =
    if (entries.isEmpty) Map.empty
    else {
      val fs = new Path(entries.head.dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      entries.map(e => fs.makeQualified(new Path(e.dir)).toString -> e.stats).toMap
    }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val v1 = dataFilters.flatMap(GraftSqlBridge.translateFilter)
    if (v1.isEmpty) return base
    base.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        statsByDir.get(f.getPath.getParent.toString) match {
          case Some(stats) => DirStats.mayMatch(stats, v1)
          case None => true   // not a manifest dir we know: never prune
        }
      })
    }.filter(_.files.nonEmpty)
  }
}
