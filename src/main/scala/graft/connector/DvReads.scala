package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, not, udf}

/** Deletion-vector subtraction for DIRECT (V1) parquet reads of manifest
  * dirs — the companion of the DSv2 scan path in [[GraftDvRead]], for the
  * callers that deliberately read `spark.read.parquet(dirs)` instead of
  * going through the catalog table (compaction's rewrite input, and the
  * upsert store's merge source, which must not self-reference the merge
  * target). V1 parquet reads serve the hidden `_metadata` struct; its
  * `file_path` is the qualified Path string and `row_index` the same
  * parquet global row index the vectors are keyed on.
  *
  * The subtraction is a predicate over (file_path, row_index) that
  * resolves vectors EXECUTOR-side through [[DeletionVectorCache]] — the
  * driver ships only the dir→vector-path map, never the positions, so a
  * streaming state table carrying millions of vectored rows between
  * compactions costs each executor one small read per vector instead of a
  * driver-materialized broadcast per micro-batch. (One of the repo's few
  * justified UDFs: the probe is a per-row binary search over cached
  * primitive arrays on a maintenance/fold path, not expressible as a
  * codegen-friendly join without re-materializing the positions.)
  */
object DvReads {

  /** Qualified-dir-path -> vector-file-path for the entries that carry a
    * vector (the probe's routing map — shipped to executors, the positions
    * are not).
    */
  private[connector] def dvPathMap(entries: Seq[DirEntry],
                                   conf: Configuration): Map[String, String] = {
    val vectored = entries.filter(_.dv.isDefined)
    if (vectored.isEmpty) return Map.empty
    val fs = new Path(vectored.head.dir).getFileSystem(conf)
    vectored.map(e => fs.makeQualified(new Path(e.dir)).toString -> e.dv.get).toMap
  }

  /** The deleted-position probe as a Column predicate over this read's
    * hidden `_metadata` struct: true iff the row's (file, row_index) is in
    * its dir's vector per `dvPathByDir`. Dirs absent from the map probe
    * false, so one predicate serves mixed vectored/clean reads.
    */
  private[connector] def deletedAt(dvPathByDir: Map[String, String],
                                   conf: Configuration): org.apache.spark.sql.Column = {
    val sconf = new SerializableHadoopConf(conf)
    val isDeleted = udf { (file: String, pos: Long) =>
      val cut = file.lastIndexOf('/')
      dvPathByDir.get(file.substring(0, cut)) match {
        case None => false
        case Some(dvPath) =>
          val arr = DeletionVectorCache.get(dvPath, sconf.value).files
            .getOrElse(file.substring(cut + 1), Array.emptyLongArray)
          java.util.Arrays.binarySearch(arr, pos) >= 0
      }
    }
    isDeleted(col("_metadata.file_path"), col("_metadata.row_index"))
  }

  /** `df` must be a V1 parquet read over exactly `entries`' dirs. Returns
    * it with every vectored position removed; a vector-free entry list
    * returns `df` untouched.
    */
  def applyVectors(spark: SparkSession, df: DataFrame, entries: Seq[DirEntry],
                   conf: Configuration): DataFrame = {
    val dvPathByDir = dvPathMap(entries, conf)
    if (dvPathByDir.isEmpty) return df
    df.where(not(deletedAt(dvPathByDir, conf)))
  }

  /** Rewrite `entries`' dirs with their vectors APPLIED into one fresh dir
    * of `log`, returning its stats-carrying entry — None when every row
    * was vector-deleted (committing an empty dir would be dead weight; the
    * unreferenced output is vacuum's to reclaim, like any aborted staging
    * dir). One combined Spark job regardless of dir count — the shared
    * recipe of the materialized row-level commit and RESTORE's
    * conflicting-dir rewrite. `schema` is the LOGICAL schema whose
    * physical projection to read (pass the snapshot's own schema: the
    * output must carry the same physical column names the manifest's
    * stats and readers expect).
    */
  def rewriteApplied(spark: SparkSession, log: TableLog, entries: Seq[DirEntry],
                     schema: org.apache.spark.sql.types.StructType): Option[DirEntry] = {
    val out = log.newDataDir()
    val df = spark.read.schema(ColumnMapping.toPhysical(schema))
      .parquet(entries.map(_.dir): _*)
    applyVectors(spark, df, entries, log.hadoopConf)
      .write.parquet(out)
    val stats = DirStats.collect(out, log.hadoopConf)
    // "empty" must not depend on stats being readable: collect returns
    // None on unreadable footers, and committing a stats-less dir that
    // holds zero parquet files would add dead weight the doc above says
    // is omitted — fall back to listing the dir in that case
    val empty = stats match {
      case Some(s) => s.rows == 0
      case None =>
        val fs = new Path(out).getFileSystem(log.hadoopConf)
        !fs.listStatus(new Path(out))
          .exists(_.getPath.getName.endsWith(".parquet"))
    }
    if (empty) None else Some(DirEntry(out, stats))
  }
}
