package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Export one snapshot of a graft table as a Delta Lake table — the
  * interop escape hatch for external engines (the graft manifest format is
  * private; Delta's transaction-log format is a published open protocol,
  * delta-io PROTOCOL.md, and the jars are deliberately absent from this
  * build). The export MATERIALIZES the snapshot: deletion vectors applied,
  * column-mapping physical names renamed to logical, rows rewritten as
  * plain parquet under `dest` — then one `_delta_log/0...0.json` commit is
  * written listing those files, so ANY Delta reader (Spark+delta, DuckDB
  * delta, Trino, polars) reads exactly the snapshot's live rows:
  *
  *   - `protocol` minReaderVersion 1 / minWriterVersion 2 — the floor
  *     every reader supports; nothing in the exported table (no DVs, no
  *     column mapping, no generated columns) needs more;
  *   - `metaData` with the snapshot's LOGICAL schema as `schemaString`
  *     (Delta serializes schemas as Spark StructType JSON — byte-portable
  *     here), `format` parquet, no partition columns (the export is a
  *     flat materialization; graft's layout has stats-pruned dirs, not
  *     hive value paths);
  *   - one `add` per written part file: root-relative path, size,
  *     mtime, `dataChange: true`, and `stats` carrying `numRecords` so
  *     Delta readers can answer count(*) from the log.
  *
  * One action per line (NDJSON), commitInfo first — the exact layout
  * delta-io writes. The export is a snapshot COPY, not a live mirror:
  * later graft commits do not appear (re-export to a fresh dir). The
  * in-container gate is structural + behavioral (DeltaExportSpec parses
  * the log against the protocol shape and diffs the parquet against the
  * source snapshot); no Delta reader ships in this environment, which is
  * exactly why the export exists.
  */
object DeltaExport {

  final case class ExportStats(files: Int, rows: Long, bytes: Long,
                               location: String)

  def exportSnapshot(spark: SparkSession, log: TableLog, dest: String,
                     version: Option[Long] = None): ExportStats = {
    val fs = new Path(dest).getFileSystem(log.hadoopConf)
    val destPath = new Path(dest)
    require(!fs.exists(destPath) || fs.listStatus(destPath).isEmpty,
      s"export destination $dest already exists and is not empty — " +
        "exports are immutable snapshots; use a fresh directory")
    val v = version.orElse(log.latestVersion)
    version.foreach { req =>
      val latest = log.latestVersion.getOrElse(-1L)
      require(req >= 1 && req <= latest,
        s"export version $req out of range [1, $latest] for ${log.tableDir}")
    }
    val (schema, _) = v.map(log.metaAt).getOrElse(log.baseMetaPublic)
    val entries = v.map(log.entriesAt).getOrElse(Nil)

    // materialize: vector-subtracted, logically-named plain parquet.
    // mode overwrite, NOT the default ErrorIfExists: the require above
    // already admitted an existing-but-EMPTY destination (a pre-created
    // dir or object-store prefix), which ErrorIfExists would then reject
    // — on an empty dir the two modes write identical results
    if (entries.nonEmpty) {
      val df0 = spark.read.schema(ColumnMapping.toPhysical(schema))
        .parquet(entries.map(_.dir): _*)
      val df = ColumnMapping.renameDf(
        DvReads.applyVectors(spark, df0, entries, log.hadoopConf),
        ColumnMapping.inverseMap(schema))
      df.write.mode("overwrite").parquet(dest)
    } else fs.mkdirs(destPath)

    val parts = if (!fs.exists(destPath)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(destPath)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-") &&
          st.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)

    // per-file row counts from the parquet footers (stats.numRecords lets
    // Delta readers serve count(*) log-only). Small exports read footers
    // driver-side (cheap, no job); a wide export distributes the footer
    // reads as one Spark job — at 100k files on an object store, serial
    // driver reads would be the export's slowest step, and the collected
    // result is just (name, count) pairs, bounded by the file count like
    // the manifest itself
    val rowsByFile: Map[String, Long] =
      if (parts.length <= 64)
        parts.map(st => st.getPath.getName -> footerRows(st.getPath, log)).toMap
      else {
        val conf = new org.apache.spark.util.SerializableConfiguration(log.hadoopConf)
        spark.sparkContext
          .parallelize(parts.map(_.getPath.toString).toSeq,
            math.min(parts.length, 256))
          .map { p =>
            val path = new Path(p)
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf.value))
            try path.getName -> reader.getRecordCount finally reader.close()
          }
          .collect().toMap
      }

    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def obj() = om.createObjectNode()
    val now = System.currentTimeMillis()
    // Delta schemaString is Spark StructType JSON; strip graft's internal
    // field metadata (physical-name mapping) — meaningless to a reader of
    // the materialized files, which carry logical names
    val cleanSchema = StructType(schema.fields.map(_.copy(
      metadata = org.apache.spark.sql.types.Metadata.empty)))

    val commitInfo = obj()
    val ci = commitInfo.putObject("commitInfo")
    ci.put("timestamp", now)
    ci.put("operation", "WRITE")
    ci.putObject("operationParameters").put("mode", "ErrorIfExists")

    val protocol = obj()
    val p = protocol.putObject("protocol")
    p.put("minReaderVersion", 1)
    p.put("minWriterVersion", 2)

    val metaData = obj()
    val m = metaData.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", cleanSchema.json)
    m.putArray("partitionColumns")
    m.putObject("configuration")
    m.put("createdTime", now)

    val adds = parts.map { st =>
      val a = obj()
      val add = a.putObject("add")
      add.put("path", st.getPath.getName)
      add.putObject("partitionValues")
      add.put("size", st.getLen)
      add.put("modificationTime", st.getModificationTime)
      add.put("dataChange", true)
      add.put("stats", s"""{"numRecords":${rowsByFile(st.getPath.getName)}}""")
      a
    }

    val logDir = new Path(dest, "_delta_log")
    fs.mkdirs(logDir)
    val commitFile = new Path(logDir, "0" * 20 + ".json")
    val out = fs.create(commitFile, false)
    try {
      (Seq(commitInfo, protocol, metaData) ++ adds).foreach { node =>
        out.write(om.writeValueAsString(node).getBytes("UTF-8"))
        out.write('\n')
      }
    } finally out.close()

    ExportStats(parts.length, rowsByFile.values.sum,
      parts.map(_.getLen).sum, dest)
  }

  private def footerRows(file: Path, log: TableLog): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, log.hadoopConf))
    try reader.getRecordCount finally reader.close()
  }
}
