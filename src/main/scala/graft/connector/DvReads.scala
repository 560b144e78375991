package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Deletion-vector subtraction for DIRECT (V1) parquet reads of manifest
  * dirs — the companion of the DSv2 scan path in [[GraftDvRead]], for the
  * callers that deliberately read `spark.read.parquet(dirs)` instead of
  * going through the catalog table (compaction's rewrite input, and the
  * upsert store's merge source, which must not self-reference the merge
  * target). V1 parquet reads serve the hidden `_metadata` struct; its
  * `file_path` is the qualified Path string and `row_index` the same
  * parquet global row index the vectors are keyed on, so subtraction is
  * one broadcast anti-join on (file, position).
  */
object DvReads {

  /** `df` must be a V1 parquet read over exactly `entries`' dirs. Returns
    * it with every vectored position removed; a vector-free entry list
    * returns `df` untouched.
    */
  def applyVectors(spark: SparkSession, df: DataFrame, entries: Seq[DirEntry],
                   conf: Configuration): DataFrame = {
    val vectored = entries.filter(_.dv.isDefined)
    if (vectored.isEmpty) return df
    val fs = new Path(vectored.head.dir).getFileSystem(conf)
    val deletedPairs: Seq[(String, Long)] = vectored.flatMap { e =>
      DeletionVector.read(e.dv.get, conf).files.toSeq.flatMap { case (name, poss) =>
        val q = fs.makeQualified(new Path(e.dir, name)).toString
        poss.map(q -> _)
      }
    }
    if (deletedPairs.isEmpty) return df
    val session = spark
    import session.implicits._
    val del = deletedPairs.toDF("__dv_file", "__dv_pos")
    df.withColumn("__dv_file", col("_metadata.file_path"))
      .withColumn("__dv_pos", col("_metadata.row_index"))
      .join(broadcast(del), Seq("__dv_file", "__dv_pos"), "left_anti")
      .drop("__dv_file", "__dv_pos")
  }
}
