package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared state-directory probing for the append-only parquet index sinks
  * ([[NearDupSink]], [[ImageNearDupSink]], [[AnnIndexSink]],
  * [[Int8IndexSink]]).
  */
private[streaming] object IndexDirs {

  /** True iff `dir` holds parquet DATA Spark's listing would actually
    * read. Two leftovers of a crashed or empty append must NOT count:
    *   - a `_SUCCESS`-only dir (zero-row append) — no partition dir, no
    *     `.parquet` file;
    *   - a `_temporary`-only dir (append crashed before any task
    *     committed) — a DIRECTORY entry, but one Spark's listing hides.
    * The predicate mirrors Spark's hidden-path convention exactly: a name
    * starting with `_` or `.` is hidden UNLESS it contains `=` (partition
    * dirs like `__bucket=3` are data even though they start with `_`).
    * Counting either leftover as state would send the next batch into a
    * schema-less `spark.read.parquet` and kill the stream.
    */
  def hasData(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val name = st.getPath.getName
      val hidden = (name.startsWith("_") || name.startsWith(".")) &&
        !name.contains("=")
      (st.isDirectory && !hidden) ||
        (st.isFile && name.endsWith(".parquet"))
    }
  }
}
