package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Read an EXTERNAL Delta Lake table's snapshot — the inbound half of the
  * interop loop whose outbound half is [[DeltaExport]] (delta-io
  * PROTOCOL.md; the jars are deliberately absent from this build, so the
  * log replay is re-derived from the published protocol):
  *
  *   - `_delta_log/_last_checkpoint` (JSON `{version, size[, parts]}`)
  *     names the newest checkpoint; its parquet part(s) carry the full
  *     action state at that version (`add` / `remove` / `metaData` /
  *     `protocol` struct columns, one non-null per row);
  *   - JSON commits `%020d.json` AFTER the checkpoint replay in version
  *     order, one action per NDJSON line: `add` upserts a live file by
  *     path, `remove` retires one, `metaData` / `protocol` replace the
  *     current table facts. Version gaps are refused (a gap means a
  *     truncated or mid-vacuum log — reading through it would silently
  *     drop history);
  *   - `add.path` is a RELATIVE url-encoded path (absolute URIs appear in
  *     shallow clones — also handled); `add.partitionValues` re-attaches
  *     hive-partition columns the data files do not carry, cast from the
  *     protocol's string encoding to the schema type.
  *
  * Capability gate, checked LOUDLY: tables demanding reader features this
  * import does not implement are refused with the feature named —
  * `minReaderVersion` 2 (column mapping), any `readerFeatures` under
  * version 3 (deletion vectors, v2 checkpoints, …), and any `add`
  * carrying a `deletionVector`. Everything [[DeltaExport]] writes (and
  * everything a plain parquet-writing Delta 1.x writer produces) is
  * minReaderVersion 1 and imports cleanly.
  *
  * Scale shape: the driver holds (path, partitionValues) per live file —
  * the same bounded envelope as the graft manifest itself; checkpoint
  * parts are read as one parquet scan projected to the action columns;
  * the data read is a plain distributed parquet scan per partition-value
  * group (one group, one scan for unpartitioned tables).
  */
object DeltaImport {

  final case class AddFile(path: String, partitionValues: Map[String, String])

  final case class Snapshot(version: Long, schema: StructType,
                            partitionColumns: Seq[String],
                            files: Seq[AddFile]) {
    def dataSchema: StructType =
      StructType(schema.fields.filterNot(f => partitionColumns.contains(f.name)))
  }

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Resolve the current snapshot of the Delta table at `tableDir`. */
  def snapshot(spark: SparkSession, tableDir: String): Snapshot =
    snapshot(spark, tableDir, None)

  /** Resolve the snapshot AT `version` (Delta time travel on import) —
    * None = latest. Refused when the requested version is newer than the
    * log or older than its vacuumed/checkpointed horizon (no contiguous
    * replay path reaches it).
    */
  def snapshot(spark: SparkSession, tableDir: String,
               version: Option[Long]): Snapshot = {
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = new Path(tableDir, "_delta_log")
    val fs = logDir.getFileSystem(conf)
    require(fs.exists(logDir), s"no _delta_log under $tableDir — not a Delta table")

    val names = fs.listStatus(logDir).filter(_.isFile).map(_.getPath.getName)
    val commits: Map[Long, String] = names
      .filter(n => n.length == 25 && n.endsWith(".json") && n.take(20).forall(_.isDigit))
      .map(n => n.take(20).toLong -> n).toMap
    // single- and multi-part classic checkpoints
    val checkpointParts: Map[Long, Seq[String]] = names
      .filter(n => n.contains(".checkpoint") && n.endsWith(".parquet") &&
        n.take(20).forall(_.isDigit))
      .groupBy(_.take(20).toLong).map { case (v, ps) => v -> ps.toSeq.sorted }

    // COMPLETENESS is mandatory before a checkpoint may stand in for the
    // log prefix it summarizes: a multi-part checkpoint mid-upload (or a
    // partial listing) would otherwise be read as the full action state
    // and adds carried by the missing parts would silently vanish. Names
    // decide: `v.checkpoint.parquet` is one self-contained file;
    // `v.checkpoint.%010d.%010d.parquet` encodes part-i-of-n, so all n
    // must be present; any other shape (v2/UUID checkpoints — a reader
    // feature this import does not implement) is refused by name.
    val multiPart = """\d{20}\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    def checkpointComplete(v: Long): Boolean = {
      val ps = checkpointParts(v)
      if (ps == Seq(f"$v%020d.checkpoint.parquet")) true
      else {
        val parsed = ps.map {
          case multiPart(i, n) => (i.toInt, n.toInt)
          case other => throw new IllegalArgumentException(
            s"unrecognized checkpoint file name '$other' under $tableDir — " +
              "not a classic single- or multi-part checkpoint (v2/UUID " +
              "checkpoints are a reader feature this import refuses)")
        }
        val totals = parsed.map(_._2).distinct
        totals.size == 1 && parsed.map(_._1).sorted == (1 to totals.head)
      }
    }

    val lastCheckpoint: Option[Long] = {
      val lc = new Path(logDir, "_last_checkpoint")
      if (!fs.exists(lc)) None
      else {
        val in = fs.open(lc)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val node = om.readTree(txt)
        val v = node.get("version").asLong
        // _last_checkpoint is written AFTER its checkpoint completes, so a
        // named-but-incomplete checkpoint is corruption, not a race
        require(checkpointParts.contains(v) && checkpointComplete(v) &&
            Option(node.get("parts")).forall(_.asInt == checkpointParts(v).size),
          s"_last_checkpoint at $tableDir names checkpoint $v but its " +
            "parquet part set is missing or incomplete — refusing to read " +
            "a truncated table state")
        Some(v)
      }
    }
    require(commits.nonEmpty || checkpointParts.nonEmpty,
      s"empty _delta_log under $tableDir")
    val available = (commits.keySet ++ checkpointParts.keys).max
    val latest = version match {
      case None => available
      case Some(v) =>
        require(v >= 0 && v <= available,
          s"version $v out of range [0, $available] for the Delta log at $tableDir")
        v
    }
    // the checkpoint that seeds the replay must summarize a prefix of the
    // TARGET version: _last_checkpoint when it qualifies (<= target), else
    // the newest COMPLETE checkpoint at or below the target (a mid-upload
    // or too-new checkpoint is simply not used — its JSON commits replay)
    val checkpointV = lastCheckpoint.filter(_ <= latest)
      .orElse(checkpointParts.keys.toSeq.filter(_ <= latest)
        .sorted.reverse.find(checkpointComplete))

    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty
    val adds = scala.collection.mutable.LinkedHashMap[String, AddFile]()

    def checkProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
      // v1 = plain parquet + this log shape (all we need); v3 is legal
      // only when every named reader feature is one we implement (none)
      val ok = minReader <= 1 || (minReader == 3 && readerFeatures.isEmpty)
      require(ok, s"Delta table $tableDir requires reader capabilities this " +
        s"import does not implement (minReaderVersion=$minReader" +
        (if (readerFeatures.nonEmpty) s", readerFeatures=${readerFeatures.mkString(",")}"
         else "") + "); refusing rather than mis-reading")
    }

    def applyMeta(schemaString: String, pcs: Seq[String], cfg: Map[String, String]): Unit = {
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = pcs
      configuration = cfg
      val mapping = cfg.getOrElse("delta.columnMapping.mode", "none")
      require(mapping == "none", s"Delta table $tableDir uses column mapping " +
        s"'$mapping' — a reader-version-2 feature this import refuses")
    }

    // 1) checkpoint state (full action set at checkpointV)
    checkpointV.foreach { cv =>
      val parts = checkpointParts(cv).map(n => new Path(logDir, n).toString)
      val cp = spark.read.parquet(parts: _*)
      val cols = cp.columns.toSet
      if (cols.contains("protocol"))
        cp.select("protocol.*").filter(col("minReaderVersion").isNotNull)
          .collect().foreach { r =>
            val feats =
              if (r.schema.fieldNames.contains("readerFeatures") &&
                  !r.isNullAt(r.fieldIndex("readerFeatures")))
                r.getSeq[String](r.fieldIndex("readerFeatures"))
              else Nil
            checkProtocol(r.getInt(r.fieldIndex("minReaderVersion")), feats)
          }
      if (cols.contains("metaData"))
        cp.select("metaData.schemaString", "metaData.partitionColumns",
            "metaData.configuration")
          .filter(col("schemaString").isNotNull)
          .collect().foreach { r =>
            applyMeta(r.getString(0), r.getSeq[String](1),
              if (r.isNullAt(2)) Map.empty else r.getMap[String, String](2).toMap)
          }
      if (cols.contains("add")) {
        val addFields = cp.select("add.*").schema.fieldNames.toSet
        val hasDv = addFields.contains("deletionVector")
        val proj = Seq(col("add.path"), col("add.partitionValues")) ++
          (if (hasDv) Seq(col("add.deletionVector.storageType")) else Nil)
        cp.filter(col("add.path").isNotNull).select(proj: _*)
          .collect().foreach { r =>
            require(!hasDv || r.isNullAt(2),
              s"checkpoint add for ${r.getString(0)} carries a deletion " +
                "vector — a reader feature this import refuses")
            val pv = if (r.isNullAt(1)) Map.empty[String, String]
                     else r.getMap[String, String](1).toMap
            adds(r.getString(0)) = AddFile(r.getString(0), pv)
          }
      }
    }

    // 2) JSON commits after the checkpoint, contiguous
    val from = checkpointV.map(_ + 1).getOrElse(0L)
    (from to latest).foreach { v =>
      val name = commits.getOrElse(v, throw new IllegalArgumentException(
        s"Delta log at $tableDir has no commit $v (checkpoint ${checkpointV
          .getOrElse(-1L)}, latest $latest) — refusing to read through the gap"))
      val in = fs.open(new Path(logDir, name))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toVector finally in.close()
      lines.foreach { line =>
        val node = om.readTree(line)
        if (node.has("protocol")) {
          val p = node.get("protocol")
          val feats = Option(p.get("readerFeatures")).map(a =>
            (0 until a.size).map(a.get(_).asText)).getOrElse(Nil)
          checkProtocol(p.get("minReaderVersion").asInt, feats)
        }
        if (node.has("metaData")) {
          val m = node.get("metaData")
          val pcs = Option(m.get("partitionColumns")).map(a =>
            (0 until a.size).map(a.get(_).asText)).getOrElse(Nil)
          val cfg = Option(m.get("configuration")).map { c =>
            val it = c.properties().iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
            b.result()
          }.getOrElse(Map.empty[String, String])
          applyMeta(m.get("schemaString").asText, pcs, cfg)
        }
        if (node.has("add")) {
          val a = node.get("add")
          require(!a.has("deletionVector") || a.get("deletionVector").isNull,
            s"add for ${a.get("path").asText} carries a deletion vector — " +
              "a reader feature this import refuses")
          val pv = Option(a.get("partitionValues")).map { p =>
            val it = p.properties().iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) {
              val e = it.next()
              b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText)
            }
            b.result()
          }.getOrElse(Map.empty[String, String])
          adds(a.get("path").asText) = AddFile(a.get("path").asText, pv)
        }
        if (node.has("remove"))
          adds.remove(node.get("remove").get("path").asText)
      }
    }

    Snapshot(latest,
      schema.getOrElse(throw new IllegalArgumentException(
        s"Delta log at $tableDir carries no metaData action")),
      partCols, adds.values.toSeq)
  }

  /** Resolve `add.path` (relative url-encoded, or absolute for clones)
    * against the table root.
    */
  private def resolve(tableDir: String, path: String): Path =
    try {
      val u = new java.net.URI(path)
      if (u.isAbsolute) new Path(u) else new Path(tableDir, new Path(u))
    } catch {
      case _: java.net.URISyntaxException => new Path(tableDir, path)
    }

  /** The snapshot as a DataFrame: one distributed parquet scan per
    * partition-value group (exactly one for unpartitioned tables),
    * partition columns re-attached as typed literals, columns in schema
    * order. Empty table -> empty frame with the declared schema.
    */
  def readSnapshot(spark: SparkSession, tableDir: String): DataFrame =
    readSnapshot(spark, tableDir, snapshot(spark, tableDir))

  /** [[readSnapshot]] over an already-resolved [[Snapshot]] — callers that
    * also need the snapshot facts (import_delta records schema/version and
    * copies the data) resolve ONCE and pass it here, so a concurrent Delta
    * commit cannot slip between two independent log replays and make the
    * created schema inconsistent with the data actually copied.
    */
  def readSnapshot(spark: SparkSession, tableDir: String,
                   snap: Snapshot): DataFrame = {
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val byPartition = snap.files.groupBy(_.partitionValues)
    val frames = byPartition.toSeq.map { case (pv, fs) =>
      val paths = fs.map(f => resolve(tableDir, f.path).toString)
      var df = spark.read.schema(snap.dataSchema).parquet(paths: _*)
      snap.partitionColumns.foreach { pc =>
        val dt = snap.schema(pc).dataType
        val v = pv.getOrElse(pc, null)
        df = df.withColumn(pc,
          (if (v == null) lit(null) else lit(v)).cast(dt))
      }
      df.select(snap.schema.fieldNames.map(col).toSeq: _*)
    }
    frames.reduce(_ unionByName _)
  }
}
