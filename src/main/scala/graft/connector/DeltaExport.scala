package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Export one snapshot of a graft table as a Delta Lake table — the
  * interop escape hatch for external engines (the graft manifest format is
  * private; Delta's transaction-log format is a published open protocol,
  * delta-io PROTOCOL.md, and the jars are deliberately absent from this
  * build). Two shapes:
  *
  *  - MATERIALIZED (default): deletion vectors applied, column-mapping
  *    physical names renamed to logical, rows rewritten as plain parquet
  *    under `dest` — minReaderVersion 1 / minWriterVersion 2, the floor
  *    EVERY Delta reader supports (DuckDB delta, Trino, polars, …).
  *  - RAW (`materialize = false`): data files are BYTE-COPIED (no
  *    decode/encode job — O(bytes moved), the only shape that survives a
  *    100 TB export), each dir's deletion vector converts to Delta's
  *    published DV format ([[DeltaDv]]: roaring-array `.bin` files,
  *    `add.deletionVector` descriptors), and column-mapped tables export
  *    their PHYSICAL file names under `delta.columnMapping.mode=name`
  *    metadata instead of a rename rewrite. The protocol advertises
  *    exactly what the table uses: v3/v7 + `deletionVectors` (+
  *    `columnMapping`) when vectors exist, v2/v5 for mapping alone,
  *    v1/v2 otherwise — so modern Delta readers (and [[DeltaImport]],
  *    which implements both features) read exactly the live rows, and
  *    old readers refuse loudly instead of resurrecting deleted rows.
  *
  * Shared log shape: one `_delta_log/0...0.json` commit, one action per
  * line (NDJSON), commitInfo first — the exact layout delta-io writes;
  * `metaData.schemaString` is Spark StructType JSON (byte-portable);
  * each `add` carries root-relative path, size, mtime, `dataChange`,
  * and `stats.numRecords` (per-file FOOTER rows — with a DV attached,
  * readers subtract its cardinality, per the protocol). The export is a
  * snapshot COPY, not a live mirror: later graft commits do not appear
  * (re-export to a fresh dir). The in-container gate is structural +
  * behavioral (DeltaExportSpec parses the log against the protocol shape
  * and diffs the parquet; the raw shape additionally round-trips through
  * [[DeltaImport]]); no Delta reader ships in this environment, which is
  * exactly why the export exists.
  *
  * Raw-path bounds: the driver decodes each dir's GDV1 vector to build
  * the Delta DVs — bounded by `graft.mor.maxDeleteRows` (the same
  * envelope every vector operation carries); file copies distribute as
  * one Spark job past 64 files. Under a column-mapped raw export EVERY
  * struct field, nested ones included, carries id + physicalName
  * metadata (the spec's requirement for `mode=name`); nested fields map
  * to their own logical names, which is what the data files physically
  * store (graft maps top-level columns only).
  */
object DeltaExport {

  final case class ExportStats(files: Int, rows: Long, bytes: Long,
                               location: String)

  def exportSnapshot(spark: SparkSession, log: TableLog, dest: String,
                     version: Option[Long] = None,
                     materialize: Boolean = true): ExportStats = {
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
    if (materialize) exportMaterialized(spark, log, dest, schema, entries)
    else exportRaw(spark, log, dest, schema, entries)
  }

  // ---- materialized shape (vectors applied, logical names, v1/v2) ---------

  private def exportMaterialized(spark: SparkSession, log: TableLog, dest: String,
                                 schema: StructType, entries: Seq[DirEntry]): ExportStats = {
    val fs = new Path(dest).getFileSystem(log.hadoopConf)
    val destPath = new Path(dest)
    // materialize: vector-subtracted, logically-named plain parquet.
    // mode overwrite, NOT the default ErrorIfExists: the caller already
    // admitted an existing-but-EMPTY destination (a pre-created dir or
    // object-store prefix), which ErrorIfExists would then reject — on an
    // empty dir the two modes write identical results
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
    val rowsByFile = footerRowCounts(spark, log, parts.map(_.getPath))
    // Delta schemaString is Spark StructType JSON; strip graft's internal
    // field metadata (physical-name mapping) — meaningless to a reader of
    // the materialized files, which carry logical names
    val cleanSchema = StructType(schema.fields.map(_.copy(
      metadata = org.apache.spark.sql.types.Metadata.empty)))
    writeCommit(log, dest, cleanSchema, minReader = 1, minWriter = 2,
      features = Nil, config = Map.empty,
      adds = parts.toSeq.map(st => AddSpec(st.getPath.getName, st.getLen,
        st.getModificationTime, rowsByFile(st.getPath.getName), None)))
    ExportStats(parts.length, rowsByFile.values.sum,
      parts.map(_.getLen).sum, dest)
  }

  // ---- raw shape (byte copy + Delta DVs + column-mapping metadata) --------

  private def exportRaw(spark: SparkSession, log: TableLog, dest: String,
                        schema: StructType, entries: Seq[DirEntry]): ExportStats = {
    val fs = new Path(dest).getFileSystem(log.hadoopConf)
    fs.mkdirs(new Path(dest))
    // every data file of every live dir; Spark part names are UUID-unique,
    // so the flat destination cannot collide (same fact mergeInto relies
    // on) — verified anyway, a collision would silently drop a file
    val files: Seq[(Path, DirEntry)] = entries.flatMap { e =>
      val dirFs = new Path(e.dir).getFileSystem(log.hadoopConf)
      dirFs.listStatus(new Path(e.dir))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
        .map(st => (st.getPath, e))
    }
    require(files.map(_._1.getName).distinct.size == files.size,
      s"duplicate data-file names across dirs of ${log.tableDir} — " +
        "refusing a raw export that would overwrite one with the other")

    // byte copy (no decode): driver-side for small tables, one Spark job
    // for wide ones — the copy is the export's only data movement
    val confSer = new org.apache.spark.util.SerializableConfiguration(log.hadoopConf)
    val destStr = dest
    def copyOne(src: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
      val from = new Path(src)
      org.apache.hadoop.fs.FileUtil.copy(
        from.getFileSystem(conf), from,
        new Path(destStr).getFileSystem(conf), new Path(destStr, from.getName),
        false, conf)
    }
    if (files.length <= 64) files.foreach(f => copyOne(f._1.toString, log.hadoopConf))
    else spark.sparkContext
      .parallelize(files.map(_._1.toString), math.min(files.length, 256))
      .foreach(p => copyOne(p, confSer.value))

    // graft GDV1 vectors -> Delta roaring DVs, packed into one .bin file
    // (driver-held positions, bounded by graft.mor.maxDeleteRows — the
    // envelope every vector op carries)
    val vectored: Seq[(String, Array[Long])] = entries
      .filter(_.dv.isDefined)
      .flatMap { e =>
        val dv = DeletionVector.read(e.dv.get, log.hadoopConf)
        dv.files.toSeq.sortBy(_._1).filter(_._2.nonEmpty)
      }
    val dvByFile: Map[String, DeltaDv.Descriptor] =
      if (vectored.isEmpty) Map.empty
      else vectored.map(_._1)
        .zip(DeltaDv.writeFile(dest, log.hadoopConf, vectored.map(_._2)))
        .toMap

    val parts = files.map { case (p, _) => p.getFileSystem(log.hadoopConf).getFileStatus(p) }
    val rowsByFile = footerRowCounts(spark, log, parts.map(_.getPath))

    // column mapping: files keep their physical names; the schemaString
    // maps them back to logical via the published field metadata
    val mapped = ColumnMapping.needed(schema)
    val (exportSchema, maxColumnId) =
      if (!mapped) (StructType(schema.fields.map(_.copy(
        metadata = org.apache.spark.sql.types.Metadata.empty))), 0L)
      else assignMapping(schema)
    val hasDv = dvByFile.nonEmpty
    val (minReader, minWriter, features) =
      if (hasDv) (3, 7, Seq("deletionVectors") ++ (if (mapped) Seq("columnMapping") else Nil))
      else if (mapped) (2, 5, Nil)
      else (1, 2, Nil)
    val config =
      (if (mapped) Map("delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> maxColumnId.toString)
       else Map.empty[String, String]) ++
      (if (hasDv) Map("delta.enableDeletionVectors" -> "true") else Map.empty)

    writeCommit(log, dest, exportSchema, minReader, minWriter, features, config,
      parts.toSeq.map(st => AddSpec(st.getPath.getName, st.getLen,
        st.getModificationTime, rowsByFile(st.getPath.getName),
        dvByFile.get(st.getPath.getName))))
    ExportStats(parts.length, rowsByFile.values.sum,
      parts.map(_.getLen).sum, dest)
  }

  /** Column-mapping metadata for a raw export under `mode=name`: the spec
    * requires an id and physicalName on EVERY struct field, nested ones
    * included — spec-compliant readers refuse a mapped table whose nested
    * fields carry none. Top-level fields map to graft's physical names;
    * nested fields keep their logical names physically (graft maps the top
    * level only, so that IS what the data files store). Ids are assigned
    * depth-first; the second return value is the maxColumnId the table
    * configuration must advertise.
    */
  private def assignMapping(schema: StructType): (StructType, Long) = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, MetadataBuilder}
    var id = 0L
    def md(physical: String): org.apache.spark.sql.types.Metadata = {
      id += 1
      new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", physical)
        .build()
    }
    def nested(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val m = md(f.name)   // metadata first: ids land parent-before-child
        f.copy(dataType = nested(f.dataType), metadata = m)
      })
      case a: ArrayType => a.copy(elementType = nested(a.elementType))
      case m: MapType =>
        m.copy(keyType = nested(m.keyType), valueType = nested(m.valueType))
      case other => other
    }
    val fields = schema.fields.map { f =>
      val m = md(ColumnMapping.physicalName(f))
      f.copy(dataType = nested(f.dataType), metadata = m)
    }
    (StructType(fields), id)
  }

  // ---- shared commit writer -------------------------------------------------

  private final case class AddSpec(name: String, size: Long, mtime: Long,
                                   rows: Long, dv: Option[DeltaDv.Descriptor])

  private def writeCommit(log: TableLog, dest: String, schema: StructType,
                          minReader: Int, minWriter: Int, features: Seq[String],
                          config: Map[String, String], adds: Seq[AddSpec]): Unit = {
    val fs = new Path(dest).getFileSystem(log.hadoopConf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def obj() = om.createObjectNode()
    val now = System.currentTimeMillis()

    val commitInfo = obj()
    val ci = commitInfo.putObject("commitInfo")
    ci.put("timestamp", now)
    ci.put("operation", "WRITE")
    ci.putObject("operationParameters").put("mode", "ErrorIfExists")

    val protocol = obj()
    val p = protocol.putObject("protocol")
    p.put("minReaderVersion", minReader)
    p.put("minWriterVersion", minWriter)
    if (features.nonEmpty) {
      val rf = p.putArray("readerFeatures")
      features.foreach(rf.add)
      val wf = p.putArray("writerFeatures")
      features.foreach(wf.add)
    }

    val metaData = obj()
    val m = metaData.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    m.put("schemaString", schema.json)
    m.putArray("partitionColumns")
    val cfg = m.putObject("configuration")
    config.foreach { case (k, vv) => cfg.put(k, vv) }
    m.put("createdTime", now)

    val addNodes = adds.map { a =>
      val node = obj()
      val add = node.putObject("add")
      add.put("path", a.name)
      add.putObject("partitionValues")
      add.put("size", a.size)
      add.put("modificationTime", a.mtime)
      add.put("dataChange", true)
      add.put("stats", s"""{"numRecords":${a.rows}}""")
      a.dv.foreach { d =>
        val dv = add.putObject("deletionVector")
        dv.put("storageType", d.storageType)
        dv.put("pathOrInlineDv", d.pathOrInlineDv)
        d.offset.foreach(o => dv.put("offset", o))
        dv.put("sizeInBytes", d.sizeInBytes)
        dv.put("cardinality", d.cardinality)
      }
      node
    }

    val logDir = new Path(dest, "_delta_log")
    fs.mkdirs(logDir)
    val commitFile = new Path(logDir, "0" * 20 + ".json")
    val out = fs.create(commitFile, false)
    try {
      (Seq(commitInfo, protocol, metaData) ++ addNodes).foreach { node =>
        out.write(om.writeValueAsString(node).getBytes("UTF-8"))
        out.write('\n')
      }
    } finally out.close()
  }

  /** Per-file footer row counts (stats.numRecords lets Delta readers serve
    * count(*) log-only). Small exports read footers driver-side (cheap, no
    * job); a wide export distributes the footer reads as one Spark job —
    * at 100k files on an object store, serial driver reads would be the
    * export's slowest step, and the collected result is just (name, count)
    * pairs, bounded by the file count like the manifest itself.
    */
  private def footerRowCounts(spark: SparkSession, log: TableLog,
                              paths: Seq[Path]): Map[String, Long] =
    if (paths.length <= 64)
      paths.map(p => p.getName -> footerRows(p, log)).toMap
    else {
      val conf = new org.apache.spark.util.SerializableConfiguration(log.hadoopConf)
      spark.sparkContext
        .parallelize(paths.map(_.toString), math.min(paths.length, 256))
        .map { p =>
          val path = new Path(p)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf.value))
          try path.getName -> reader.getRecordCount finally reader.close()
        }
        .collect().toMap
    }

  private def footerRows(file: Path, log: TableLog): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, log.hadoopConf))
    try reader.getRecordCount finally reader.close()
  }
}
