package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructField, StructType}

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
  * READER FEATURES implemented (the modern-writer defaults):
  *   - `deletionVectors` — each add's `deletionVector` descriptor names
  *     the row positions deleted from that file ([[DeltaDv]]: Z85 +
  *     roaring-array decode); the read subtracts them with one
  *     distributed anti-join on `(_metadata.file_path, row_index)`,
  *     vectors decoded executor-side.
  *   - `columnMapping` in `name` AND `id` mode — parquet files carry
  *     PHYSICAL column names (`delta.columnMapping.physicalName` field
  *     metadata); the scan reads physical and the final projection
  *     restores logical names at every nesting level. In `id` mode the
  *     read schema additionally carries each field's
  *     `delta.columnMapping.id` as `parquet.field.id` metadata and the
  *     scan runs with Spark's parquet field-id matching (scan-scoped
  *     option), so files whose column names drifted still resolve;
  *     files carrying NO ids fail loudly instead of nulling.
  *
  *   - `v2Checkpoint` — a UUID-named checkpoint manifest
  *     (`v.checkpoint.<uuid>.(parquet|json)`, what current Databricks
  *     runtimes write) replays like a classic one; its `sidecar` actions
  *     name `_sidecars/` parquet files carrying the file actions, each
  *     verified to exist before any state is trusted.
  *
  * Anything else demanded via `minReaderVersion`/`readerFeatures` is
  * refused with the feature named — never mis-read.
  *
  * Scale shape: the driver holds (path, partitionValues, dvDescriptor)
  * per live file — the same bounded envelope as the graft manifest
  * itself; checkpoint parts are read as one parquet scan projected to
  * the action columns; the data read is ONE distributed parquet scan
  * over all live files (partition columns re-attached by a broadcast
  * join on the file path — at thousands of hive partitions a
  * scan-per-partition-group union would blow up the analyzer).
  */
object DeltaImport {

  final case class AddFile(path: String, partitionValues: Map[String, String],
                           dv: Option[DeltaDv.Descriptor] = None)

  final case class Snapshot(version: Long, schema: StructType,
                            partitionColumns: Seq[String],
                            files: Seq[AddFile],
                            columnMappingMode: String = "none") {
    def dataSchema: StructType =
      StructType(schema.fields.filterNot(f => partitionColumns.contains(f.name)))
  }

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Reader features this import implements (protocol `readerFeatures`
    * names under minReaderVersion 3): deletion vectors, column mapping,
    * and v2 checkpoints (UUID-named manifest + `_sidecars/` files) carry
    * real machinery here; `timestampNtz` is native to Spark's parquet
    * reader (TIMESTAMP_NTZ round-trips through `DataType.fromJson`);
    * `vacuumProtocolCheck`'s published reader requirements are literally
    * "None" (it constrains VACUUM, which a read-only import never runs).
    * Anything else (typeWidening, variantType, …) stays a loud refusal.
    */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "timestampNtz",
      "vacuumProtocolCheck", "v2Checkpoint")

  private val PhysicalNameKey = "delta.columnMapping.physicalName"

  /** Resolve the current snapshot of the Delta table at `tableDir`. */
  def snapshot(spark: SparkSession, tableDir: String): Snapshot =
    snapshot(spark, tableDir, None)

  /** The newest committed version, from the log LISTING alone — no
    * checkpoint content is read and no file state is built. The streaming
    * face's per-trigger probe: a short-trigger stream over a large table
    * must not pay a full log replay just to learn "nothing changed".
    */
  def latestVersion(spark: SparkSession, tableDir: String): Long = {
    val logDir = new Path(tableDir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(logDir), s"no _delta_log under $tableDir — not a Delta table")
    val versions = fs.listStatus(logDir).filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.take(20).forall(_.isDigit) &&
        ((n.length == 25 && n.endsWith(".json")) ||
          (n.contains(".checkpoint") &&
            (n.endsWith(".parquet") || (n.endsWith(".json") && n.length > 25)))))
      .map(_.take(20).toLong)
    require(versions.nonEmpty, s"empty _delta_log under $tableDir")
    versions.max
  }

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
    // classic single-/multi-part checkpoints AND v2 UUID-named checkpoint
    // manifests (parquet or json)
    val checkpointParts: Map[Long, Seq[String]] = names
      .filter(n => n.contains(".checkpoint") &&
        (n.endsWith(".parquet") || (n.endsWith(".json") && n.length > 25)) &&
        n.take(20).forall(_.isDigit))
      .groupBy(_.take(20).toLong).map { case (v, ps) => v -> ps.toSeq.sorted }

    // COMPLETENESS is mandatory before a checkpoint may stand in for the
    // log prefix it summarizes: a multi-part checkpoint mid-upload (or a
    // partial listing) would otherwise be read as the full action state
    // and adds carried by the missing parts would silently vanish. Names
    // decide: `v.checkpoint.parquet` is one self-contained file;
    // `v.checkpoint.%010d.%010d.parquet` encodes part-i-of-n, so all n
    // must be present; `v.checkpoint.<uuid>.(parquet|json)` is a v2
    // checkpoint — one self-contained manifest whose add/remove state may
    // live in `_sidecars/` files it names (each verified to exist at
    // read); any other shape is refused by name.
    val multiPart = """\d{20}\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val v2Name = ("""\d{20}\.checkpoint\.[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-""" +
      """[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\.(parquet|json)""").r
    def isV2(name: String): Boolean = v2Name.pattern.matcher(name).matches()
    def checkpointComplete(v: Long): Boolean = {
      val ps = checkpointParts(v)
      // a v2 manifest is complete by itself (writers publish sidecars
      // first); classic "compatibility" checkpoints may coexist at the
      // same version — the v2 manifest is then preferred at read
      if (ps.exists(isV2)) true
      else if (ps == Seq(f"$v%020d.checkpoint.parquet")) true
      else {
        val parsed = ps.map {
          case multiPart(i, n) => (i.toInt, n.toInt)
          case other => throw new IllegalArgumentException(
            s"unrecognized checkpoint file name '$other' under $tableDir — " +
              "not a classic single-/multi-part or v2 UUID checkpoint")
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
        // named-but-incomplete checkpoint is corruption, not a race. The
        // `parts` count describes the CLASSIC part set only — a v2 manifest
        // coexisting at the same version (the spec-legal compatibility
        // layout) must neither count toward it nor be gated by it
        require(checkpointParts.contains(v) && checkpointComplete(v) &&
            (checkpointParts(v).exists(isV2) ||
              Option(node.get("parts")).forall(_.asInt ==
                checkpointParts(v).count(n => !isV2(n)))),
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
    var mappingMode: String = "none"
    // Log replay keys file actions by (path, deletionVector.uniqueId) — the
    // protocol's reconciliation rule, NOT path alone: a DV-update commit
    // legally carries add(path, newDV) and remove(path, oldDV) for the SAME
    // path in one version, in either line order. Keyed by path only, an
    // add-before-remove ordering would cancel the surviving add and silently
    // drop every live row of that file. A remove therefore cancels only the
    // entry whose vector matches its own descriptor.
    val adds = scala.collection.mutable.LinkedHashMap[(String, Option[String]), AddFile]()

    def checkProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
      // v1 = plain parquet + this log shape; v2 = column mapping (which
      // this import implements in name mode — id mode is refused at the
      // metaData, where the mode is actually declared); v3 is legal when
      // every NAMED reader feature is one we implement
      val unsupported = readerFeatures.filterNot(SupportedReaderFeatures)
      val ok = minReader <= 2 || (minReader == 3 && unsupported.isEmpty)
      require(ok, s"Delta table $tableDir requires reader capabilities this " +
        s"import does not implement (minReaderVersion=$minReader" +
        (if (unsupported.nonEmpty) s", readerFeatures=${unsupported.mkString(",")}"
         else "") + "); refusing rather than mis-reading")
    }

    def applyMeta(schemaString: String, pcs: Seq[String], cfg: Map[String, String],
                  provider: String): Unit = {
      // the protocol pins parquet today, but the field exists precisely so
      // a future format can be declared — reading such a table as parquet
      // would be garbage, not an error
      require(provider == "parquet",
        s"Delta table $tableDir stores '$provider' data files — this import " +
          "reads parquet only; refusing rather than mis-reading")
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = pcs
      // `name` mode reads by the physicalName field metadata (the schema
      // carries the whole mapping); `id` mode matches by PARQUET FIELD ID
      // — the read schema carries each field's delta.columnMapping.id as
      // `parquet.field.id` metadata and the scan runs with Spark's
      // field-id matching on, so files whose column NAMES drifted (the
      // case id mode exists for) still resolve correctly
      mappingMode = cfg.getOrElse("delta.columnMapping.mode", "none")
      require(mappingMode == "none" || mappingMode == "name" || mappingMode == "id",
        s"Delta table $tableDir uses column mapping mode '$mappingMode' — " +
          "only 'none', 'name', and 'id' are implemented; refusing rather " +
          "than mis-reading")
    }

    def descriptor(storageType: String, pathOrInlineDv: String, offset: Option[Int],
                   sizeInBytes: Int, cardinality: Long): DeltaDv.Descriptor = {
      require(storageType == "u" || storageType == "i" || storageType == "p",
        s"deletion vector storageType '$storageType' is not u/i/p — " +
          "refusing rather than mis-reading")
      DeltaDv.Descriptor(storageType, pathOrInlineDv, offset, sizeInBytes, cardinality)
    }

    // the protocol's DV uniqueId: storageType + pathOrInlineDv + '@'offset
    def dvUid(dv: Option[DeltaDv.Descriptor]): Option[String] =
      dv.map(d => d.storageType + d.pathOrInlineDv + d.offset.fold("")("@" + _))

    // protocol/metaData/add extraction from a parquet action frame — one
    // code path shared by classic checkpoint parts, v2 checkpoint
    // manifests, and v2 sidecar files (removes inside any checkpoint are
    // vacuum tombstones, never state)
    def applyParquetActions(cp: DataFrame): Unit = {
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
            "metaData.configuration", "metaData.format.provider")
          .filter(col("schemaString").isNotNull)
          .collect().foreach { r =>
            applyMeta(r.getString(0), r.getSeq[String](1),
              if (r.isNullAt(2)) Map.empty else r.getMap[String, String](2).toMap,
              if (r.isNullAt(3)) "parquet" else r.getString(3))
          }
      if (cols.contains("add")) {
        val addFields = cp.select("add.*").schema.fieldNames.toSet
        val hasDv = addFields.contains("deletionVector")
        val proj = Seq(col("add.path"), col("add.partitionValues")) ++
          (if (hasDv) Seq(col("add.deletionVector.storageType"),
            col("add.deletionVector.pathOrInlineDv"),
            col("add.deletionVector.offset"),
            col("add.deletionVector.sizeInBytes"),
            col("add.deletionVector.cardinality")) else Nil)
        cp.filter(col("add.path").isNotNull).select(proj: _*)
          .collect().foreach { r =>
            val dv = if (hasDv && !r.isNullAt(2))
              Some(descriptor(r.getString(2), r.getString(3),
                if (r.isNullAt(4)) None else Some(r.getInt(4)),
                r.getInt(5), r.getLong(6)))
            else None
            val pv = if (r.isNullAt(1)) Map.empty[String, String]
                     else r.getMap[String, String](1).toMap
            adds((r.getString(0), dvUid(dv))) = AddFile(r.getString(0), pv, dv)
          }
      }
    }

    // JSON-action twins, shared by commit replay and v2 json checkpoints
    def parseDvJson(owner: com.fasterxml.jackson.databind.JsonNode): Option[DeltaDv.Descriptor] =
      Option(owner.get("deletionVector")).filterNot(_.isNull).map { d =>
        descriptor(d.get("storageType").asText, d.get("pathOrInlineDv").asText,
          Option(d.get("offset")).filterNot(_.isNull).map(_.asInt),
          d.get("sizeInBytes").asInt, d.get("cardinality").asLong)
      }
    def applyAddJson(a: com.fasterxml.jackson.databind.JsonNode): Unit = {
      val dv = parseDvJson(a)
      val pv = Option(a.get("partitionValues")).map { p =>
        val it = p.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText)
        }
        b.result()
      }.getOrElse(Map.empty[String, String])
      adds((a.get("path").asText, dvUid(dv))) = AddFile(a.get("path").asText, pv, dv)
    }
    def applyProtocolJson(p: com.fasterxml.jackson.databind.JsonNode): Unit = {
      val feats = Option(p.get("readerFeatures")).map(a =>
        (0 until a.size).map(a.get(_).asText)).getOrElse(Nil)
      checkProtocol(p.get("minReaderVersion").asInt, feats)
    }
    def applyMetaJson(m: com.fasterxml.jackson.databind.JsonNode): Unit = {
      val pcs = Option(m.get("partitionColumns")).map(a =>
        (0 until a.size).map(a.get(_).asText)).getOrElse(Nil)
      val cfg = Option(m.get("configuration")).map { c =>
        val it = c.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
        b.result()
      }.getOrElse(Map.empty[String, String])
      val provider = Option(m.get("format")).flatMap(f =>
        Option(f.get("provider")).map(_.asText)).getOrElse("parquet")
      applyMeta(m.get("schemaString").asText, pcs, cfg, provider)
    }

    // sidecar path -> full path: relative names live under
    // `_delta_log/_sidecars/`; absolute URIs (shared-storage layouts)
    // resolve as written — the same decode-once rule as add.path, via the
    // shared resolver. Each named sidecar must EXIST — a missing one means
    // the checkpoint's state is partial, which must never read as "fewer
    // live files"
    def sidecarPath(p: String): Path = {
      val resolved = resolve(s"$logDir/_sidecars", p)
      require(fs.exists(resolved),
        s"v2 checkpoint of $tableDir names sidecar '$p' but " +
          s"$resolved does not exist — refusing to read a partial table state")
      resolved
    }

    // 1) checkpoint state (full action set at checkpointV)
    checkpointV.foreach { cv =>
      val ps = checkpointParts(cv)
      val v2 = ps.filter(isV2).sorted
      if (v2.nonEmpty) {
        // v2 UUID checkpoint: one manifest (json or parquet) carrying
        // protocol/metaData (+ checkpointMetadata) and either inline file
        // actions or `sidecar` actions naming the files that do. Several
        // manifests at one version describe the same state — read the first.
        val manifest = new Path(logDir, v2.head)
        val sidecars = scala.collection.mutable.ArrayBuffer[String]()
        if (v2.head.endsWith(".json")) {
          val in = fs.open(manifest)
          val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toVector finally in.close()
          lines.foreach { line =>
            val node = om.readTree(line)
            if (node.has("protocol")) applyProtocolJson(node.get("protocol"))
            if (node.has("metaData")) applyMetaJson(node.get("metaData"))
            if (node.has("add")) applyAddJson(node.get("add"))
            if (node.has("sidecar")) sidecars += node.get("sidecar").get("path").asText
            if (node.has("checkpointMetadata"))
              require(node.get("checkpointMetadata").get("version").asLong == cv,
                s"v2 checkpoint ${v2.head} of $tableDir declares " +
                  s"checkpointMetadata version ${node.get("checkpointMetadata")
                    .get("version").asLong}, expected $cv — corrupt log")
          }
        } else {
          val cp = spark.read.parquet(manifest.toString)
          if (cp.columns.contains("checkpointMetadata"))
            cp.select("checkpointMetadata.version").filter(col("version").isNotNull)
              .collect().foreach(r => require(r.getLong(0) == cv,
                s"v2 checkpoint ${v2.head} of $tableDir declares " +
                  s"checkpointMetadata version ${r.getLong(0)}, expected $cv — corrupt log"))
          applyParquetActions(cp)
          if (cp.columns.contains("sidecar"))
            cp.select("sidecar.path").filter(col("path").isNotNull)
              .collect().foreach(r => sidecars += r.getString(0))
        }
        if (sidecars.nonEmpty) {
          val paths = sidecars.toSeq.map(p => sidecarPath(p).toString)
          applyParquetActions(spark.read.parquet(paths: _*))
        }
      } else {
        val parts = ps.map(n => new Path(logDir, n).toString)
        applyParquetActions(spark.read.parquet(parts: _*))
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
        if (node.has("protocol")) applyProtocolJson(node.get("protocol"))
        if (node.has("metaData")) applyMetaJson(node.get("metaData"))
        if (node.has("add")) applyAddJson(node.get("add"))
        if (node.has("remove")) {
          val rm = node.get("remove")
          adds.remove((rm.get("path").asText, dvUid(parseDvJson(rm))))
        }
      }
    }

    // a VALID table state holds at most one live entry per path; two
    // surviving (add, remove-mismatched) entries would double-read the file
    val dupPaths = adds.values.groupBy(_.path).collect { case (p, fs) if fs.size > 1 => p }
    require(dupPaths.isEmpty,
      s"Delta log at $tableDir reconciles to ${dupPaths.size} path(s) with " +
        s"MULTIPLE live add entries (${dupPaths.take(3).mkString(", ")}) — " +
        "corrupt log; refusing to double-read")
    Snapshot(latest,
      schema.getOrElse(throw new IllegalArgumentException(
        s"Delta log at $tableDir carries no metaData action")),
      partCols, adds.values.toSeq, mappingMode)
  }

  /** The APPEND-ONLY increment between two snapshots of one Delta table:
    * a snapshot holding exactly the files added after `old` — the unit
    * `refresh_delta` copies. Anything that is NOT a pure append between
    * the two versions refuses loudly, because an incremental copy cannot
    * represent it:
    *
    *  - a file of `old` missing from `new` (a DELETE/UPDATE/compaction
    *    rewrite retired it);
    *  - a surviving file whose deletion vector CHANGED (rows deleted
    *    from data already imported);
    *  - a schema / partitioning / column-mapping change.
    *
    * A brand-NEW file carrying a deletion vector is fine — its live rows
    * are simply (file minus vector), which [[readSnapshot]] reads
    * correctly.
    */
  def appendOnlyIncrement(oldSnap: Snapshot, newSnap: Snapshot,
                          tableDir: String): Snapshot = {
    require(oldSnap.schema.json == newSnap.schema.json &&
        oldSnap.partitionColumns == newSnap.partitionColumns &&
        oldSnap.columnMappingMode == newSnap.columnMappingMode,
      s"Delta table $tableDir changed its schema/partitioning/mapping " +
        s"between versions ${oldSnap.version} and ${newSnap.version} — " +
        "re-import instead of refreshing")
    val newByPath = newSnap.files.map(f => f.path -> f).toMap
    oldSnap.files.foreach { f =>
      val survivor = newByPath.getOrElse(f.path, throw new IllegalArgumentException(
        s"Delta table $tableDir retired file ${f.path} between versions " +
          s"${oldSnap.version} and ${newSnap.version} (delete/update/" +
          "compaction) — not an append-only increment; re-import instead"))
      require(survivor.dv == f.dv,
        s"Delta table $tableDir changed the deletion vector of ${f.path} " +
          s"between versions ${oldSnap.version} and ${newSnap.version} — " +
          "rows were deleted from already-imported data; re-import instead")
    }
    val oldPaths = oldSnap.files.map(_.path).toSet
    newSnap.copy(files = newSnap.files.filterNot(f => oldPaths(f.path)))
  }

  /** Resolve `add.path` (relative url-encoded, or absolute for clones)
    * against the table root. Percent-escapes are decoded ONCE, by the
    * URI parser — the decoded string then builds the Hadoop Path
    * directly, so names carrying spaces or literal '%' survive (a
    * URI→Path→string→Path round trip re-parses and can diverge).
    */
  /** [[resolve]] for the streaming face ([[DeltaImportMicroBatchStream]]). */
  private[connector] def resolvePath(tableDir: String, path: String): Path =
    resolve(tableDir, path)

  private def resolve(tableDir: String, path: String): Path =
    try {
      val u = new java.net.URI(path)
      if (u.isAbsolute) new Path(u)
      else new Path(tableDir, u.getPath)
    } catch {
      case _: java.net.URISyntaxException => new Path(tableDir, path)
    }

  // ---- column mapping: logical schema -> physical (file) schema ------------

  private def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  private val FieldIdKey = "delta.columnMapping.id"

  /** The read schema for the parquet files: physical names at every
    * nesting level; in `id` mode each field additionally carries its
    * delta column id as `parquet.field.id` metadata, which is what
    * Spark's parquet field-id matching keys on.
    */
  private def physicalType(dt: DataType, withIds: Boolean): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        val md =
          if (withIds && f.metadata.contains(FieldIdKey))
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong("parquet.field.id", f.metadata.getLong(FieldIdKey))
              .build()
          else f.metadata
        f.copy(name = physicalName(f), dataType = physicalType(f.dataType, withIds),
          metadata = md)
      })
    case ArrayType(e, n) => ArrayType(physicalType(e, withIds), n)
    case MapType(k, v, n) => MapType(physicalType(k, withIds), physicalType(v, withIds), n)
    case other => other
  }

  private def physicalSchema(schema: StructType, withIds: Boolean): StructType =
    physicalType(schema, withIds).asInstanceOf[StructType]

  /** The physical (file-side) data schema of a snapshot — what a delegated
    * parquet scan must request (the streaming face's read schema).
    */
  private[connector] def physicalDataSchema(snap: Snapshot): StructType =
    physicalSchema(snap.dataSchema, withIds = snap.columnMappingMode == "id")

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"

  private val FieldIdReadKey = "spark.sql.parquet.fieldId.read.enabled"

  /** Run `body` — which must EXECUTE any [[readSnapshot]] frames it builds
    * (write/collect/checkpoint) — and afterwards restore
    * `spark.sql.parquet.fieldId.read.enabled` to its prior value. An
    * id-mode readSnapshot has to set that flag session-wide because
    * Spark's parquet reader consults the session conf at plan-execution
    * time; this scopes the mutation for eager callers (the import and
    * refresh procedures), so a user read running AFTER the procedure sees
    * the session exactly as before.
    */
  def withFieldIdRead[T](spark: SparkSession)(body: => T): T = {
    val prior = spark.conf.getOption(FieldIdReadKey)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(FieldIdReadKey, v)
      case None => spark.conf.unset(FieldIdReadKey)
    }
  }

  /** The snapshot as a DataFrame: ONE distributed parquet scan over every
    * live file. Partition columns re-attach by a broadcast join of the
    * driver-held (file -> partitionValues) map on `_metadata.file_path`
    * (bounded number of scan nodes however many hive partitions the
    * source carries); deletion vectors subtract by one anti-join on
    * `(file_path, row_index)`, decoded executor-side; column-mapped
    * files read under physical names and project back to logical.
    * Columns in schema order. Empty table -> empty frame with the
    * declared schema.
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
    val conf = spark.sparkContext.hadoopConfiguration
    // qualified path string per file — the exact representation Spark's
    // `_metadata.file_path` reports (both sides are a qualified
    // org.apache.hadoop.fs.Path rendered by toString)
    val entries: Seq[(String, AddFile)] = snap.files.map { f =>
      val p = resolve(tableDir, f.path)
      (p.getFileSystem(conf).makeQualified(p).toString, f)
    }
    require(entries.map(_._1).distinct.size == entries.size,
      s"two add entries of the Delta log at $tableDir resolve to the same " +
        "data file — refusing to double-read it")
    val hasDv = snap.files.exists(_.dv.isDefined)
    val needFilePath = hasDv || snap.partitionColumns.nonEmpty
    val byId = snap.columnMappingMode == "id"
    val physData = physicalSchema(snap.dataSchema, withIds = byId)

    val FP = "__delta_file_path"
    val RI = "__delta_row_index"
    if (byId) {
      // Spark's parquet reader takes this flag from the SESSION conf at
      // plan-execution time (a reader option is overridden), so it must
      // be enabled session-wide AND STAY set until the returned lazy frame
      // has executed — restoring it here would turn the scan back into
      // name matching underneath the caller. This is a documented contract
      // of readSnapshot over an id-mode table; eager callers (the
      // import/refresh procedures) scope it with [[withFieldIdRead]]. The
      // leak is benign for every other read: field-id matching only
      // engages when the REQUESTED schema carries `parquet.field.id`
      // metadata, i.e. exactly the id-mode schemas built here.
      // ignoreMissing stays at its default (false): id-mode files carrying
      // no ids fail loudly, never null.
      spark.conf.set(FieldIdReadKey, "true")
    }
    var df = spark.read.schema(physData).parquet(entries.map(_._1): _*)
    if (needFilePath) {
      val metaCols = Seq(col("_metadata.file_path").as(FP)) ++
        (if (hasDv) Seq(col("_metadata.row_index").as(RI)) else Nil)
      df = df.select(col("*") +: metaCols: _*)
    }

    if (hasDv) {
      import spark.implicits._
      val confSer = new SerializableHadoopConf(conf)
      val td = tableDir
      val dvEntries = entries.collect { case (key, f) if f.dv.isDefined =>
        val d = f.dv.get
        (key, d.storageType, d.pathOrInlineDv, d.offset.getOrElse(-1),
          d.sizeInBytes, d.cardinality)
      }
      // descriptors ship; positions materialize per task (never the driver)
      val deleted = spark.createDataset(dvEntries)
        .flatMap { case (key, st, pi, off, size, card) =>
          DeltaDv.positions(td,
            DeltaDv.Descriptor(st, pi, if (off < 0) None else Some(off), size, card),
            confSer.value).iterator.map(p => (key, p))
        }.toDF(FP, RI)
      // the anti-join exchanges an 8-byte xxhash of the file path instead
      // of the full path string (at 100 TB, paths dominate the shuffle
      // payload of the deleted-positions side). Hash collisions across
      // DISTINCT paths would wrongly delete another file's rows at the
      // same position — guarded driver-side; the (astronomically rare)
      // colliding table falls back to the exact string key.
      val FH = "__delta_fp_hash"
      val hashSafe = entries.map(e => DeltaDv.pathHash(e._1)).distinct.size == entries.size
      if (hashSafe) {
        val hash = org.apache.spark.sql.functions.xxhash64(col(FP))
        df = df.withColumn(FH, hash)
          .join(deleted.select(hash.as(FH), col(RI)), Seq(FH, RI), "left_anti")
          .drop(FH)
      } else df = df.join(deleted, Seq(FP, RI), "left_anti")
    }

    if (snap.partitionColumns.nonEmpty) {
      // partitionValues keys are PHYSICAL names under column mapping
      val pvKeys = snap.partitionColumns.map { pc =>
        pc -> snap.schema.fields.find(_.name == pc).map(physicalName).getOrElse(pc)
      }
      val pvRows: java.util.List[Row] = new java.util.ArrayList[Row](entries.size)
      entries.foreach { case (key, f) =>
        pvRows.add(Row.fromSeq(key +: pvKeys.map { case (logical, physical) =>
          f.partitionValues.get(physical)
            .orElse(f.partitionValues.get(logical)).orNull
        }))
      }
      val pvSchema = StructType(StructField(FP, StringType) +:
        snap.partitionColumns.map(pc => StructField(s"__pv_$pc", StringType)))
      df = df.join(broadcast(spark.createDataFrame(pvRows, pvSchema)), Seq(FP))
    }

    // final projection: logical names (incl. nested, via positional struct
    // cast) + typed partition columns, in schema order
    val out = snap.schema.fields.map { lf =>
      if (snap.partitionColumns.contains(lf.name))
        col(quoted(s"__pv_${lf.name}")).cast(lf.dataType).as(lf.name)
      else {
        val pf = physData(snap.dataSchema.fieldIndex(lf.name))
        val c = col(quoted(pf.name))
        (if (pf.dataType == lf.dataType) c else c.cast(lf.dataType)).as(lf.name)
      }
    }
    df.select(out.toSeq: _*)
  }
}
