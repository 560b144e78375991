package graft.connector

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta Lake snapshot export (the interop waiver, closed structurally):
  * the written `_delta_log` must match the published Delta protocol shape
  * line for line — commitInfo, protocol (1, 2), metaData with the logical
  * schemaString, one add per part file with real sizes and numRecords —
  * and the materialized parquet must equal the source snapshot's LIVE rows
  * (vectors applied, logical column names). No Delta reader ships in this
  * container (zero egress), so the gate is protocol-structural plus a
  * plain-parquet data diff; any engine that reads Delta reads this.
  */
class DeltaExportSpec extends LakeSpec {
  protected def catalogName = "explake"

  private def readLog(dest: String): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val om = new ObjectMapper()
    val logFile = new java.io.File(s"$dest/_delta_log/${"0" * 20}.json")
    assert(logFile.isFile, s"missing Delta commit file at $logFile")
    scala.io.Source.fromFile(logFile, "UTF-8").getLines().toSeq
      .filter(_.nonEmpty).map(om.readTree)
  }

  test("export writes a protocol-shaped log and the snapshot's exact rows") {
    sql("CREATE NAMESPACE IF NOT EXISTS explake.db")
    sql("CREATE TABLE explake.db.t (k BIGINT, v STRING)")
    sql("INSERT INTO explake.db.t SELECT id, concat('v', id) FROM range(0, 100)")
    sql("INSERT INTO explake.db.t SELECT id, concat('v', id) FROM range(100, 150)")
    val dest = s"${tmp("delta-export")}/t"
    val out = rows(s"CALL explake.system.export_delta(`table` => 'db.t', " +
      s"location => '$dest')")
    assert(out.size === 1)
    val (files, nRows) = (out.head.getInt(0), out.head.getLong(1))
    assert(nRows === 150L)
    assert(out.head.getString(3) === dest)

    val actions = readLog(dest)
    // line order and action shape per the protocol
    assert(actions.head.has("commitInfo"))
    val protocol = actions(1).get("protocol")
    assert(protocol.get("minReaderVersion").asInt === 1)
    assert(protocol.get("minWriterVersion").asInt === 2)
    val meta = actions(2).get("metaData")
    assert(meta.get("format").get("provider").asText === "parquet")
    assert(meta.get("partitionColumns").size === 0)
    assert(meta.has("id") && meta.has("configuration"))
    val schema = DataType.fromJson(meta.get("schemaString").asText)
      .asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq === Seq("k", "v"))
    val adds = actions.drop(3).map(_.get("add"))
    assert(adds.size === files)
    assert(adds.forall(_ != null), "every action past metaData must be an add")
    adds.foreach { a =>
      val f = new java.io.File(s"$dest/${a.get("path").asText}")
      assert(f.isFile, s"add references missing file ${a.get("path").asText}")
      assert(f.length === a.get("size").asLong, "add.size must match the file")
      assert(a.get("dataChange").asBoolean)
    }
    val statRows = adds.map(a =>
      new ObjectMapper().readTree(a.get("stats").asText).get("numRecords").asLong).sum
    assert(statRows === 150L, "stats.numRecords must sum to the row count")

    // the materialized parquet IS the snapshot
    val exported = spark.read.parquet(dest)
      .orderBy("k").collect().toSeq
    val source = rows("SELECT k, v FROM explake.db.t ORDER BY k")
    assert(exported === source)
  }

  test("merge-on-read deletions and renamed columns export materialized") {
    sql("CREATE TABLE explake.db.m (k BIGINT, val STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO explake.db.m SELECT id, 'x' FROM range(0, 100)")
    sql("DELETE FROM explake.db.m WHERE k % 2 = 0")
    sql("ALTER TABLE explake.db.m RENAME COLUMN val TO renamed")
    val dest = s"${tmp("delta-export-mor")}/m"
    rows(s"CALL explake.system.export_delta(`table` => 'db.m', location => '$dest')")

    val exported = spark.read.parquet(dest)
    // logical (renamed) column names, not the physical parquet names
    assert(exported.columns.toSeq === Seq("k", "renamed"))
    // deleted rows are NOT in the export (a raw dir copy would resurrect them)
    assert(exported.count() === 50L)
    assert(exported.filter("k % 2 = 0").count() === 0L)
    val meta = readLog(dest)(2).get("metaData")
    val schema = DataType.fromJson(meta.get("schemaString").asText)
      .asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq === Seq("k", "renamed"))
    assert(schema.forall(_.metadata.json == "{}"),
      "internal physical-name metadata must not leak into the export")
  }

  test("raw export: byte-copied files, real deletion vectors, mapping metadata") {
    sql("CREATE NAMESPACE IF NOT EXISTS explake.db")
    sql("CREATE TABLE explake.db.r (k BIGINT, val STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO explake.db.r SELECT id, concat('x', id) FROM range(0, 100)")
    sql("INSERT INTO explake.db.r SELECT id, concat('x', id) FROM range(100, 160)")
    sql("DELETE FROM explake.db.r WHERE k % 3 = 0")
    sql("ALTER TABLE explake.db.r RENAME COLUMN val TO renamed")
    val dest = s"${tmp("delta-export-raw")}/r"
    val out = rows(s"CALL explake.system.export_delta(`table` => 'db.r', " +
      s"location => '$dest', materialize => false)")
    assert(out.head.getLong(1) === 160L, "raw stats count FILE rows (physical)")

    // the log advertises exactly what the table uses
    val logLines = readLog(dest)
    val proto = logLines(1).get("protocol")
    assert(proto.get("minReaderVersion").asInt === 3)
    assert(proto.get("minWriterVersion").asInt === 7)
    val feats = (0 until proto.get("readerFeatures").size)
      .map(proto.get("readerFeatures").get(_).asText).toSet
    assert(feats === Set("deletionVectors", "columnMapping"))
    val meta = logLines(2).get("metaData")
    assert(meta.get("configuration").get("delta.columnMapping.mode").asText === "name")
    val schema = DataType.fromJson(meta.get("schemaString").asText)
      .asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq === Seq("k", "renamed"))
    assert(schema("renamed").metadata.contains("delta.columnMapping.physicalName"))
    // at least one add carries a DV descriptor with real cardinality
    val dvCards = logLines.drop(3).filter(_.has("add"))
      .flatMap(n => Option(n.get("add").get("deletionVector")))
      .map(_.get("cardinality").asLong)
    assert(dvCards.sum === 54L, s"expected 54 deleted positions, got $dvCards")

    // the copied files are BYTE-identical to the source dirs (no rewrite)
    val srcBytes = log("db/r").currentDirs().flatMap { d =>
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(d))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.getName -> st.getLen)
    }.toMap
    val destFs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val destBytes = destFs.listStatus(new org.apache.hadoop.fs.Path(dest))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    assert(destBytes === srcBytes, "raw export must copy files byte-for-byte")

    // ... and the import half of the loop reads exactly the live rows
    // under logical names — vectors subtracted, physical names mapped back
    val back = DeltaImport.readSnapshot(spark, dest)
    assert(back.schema.fieldNames.toSeq === Seq("k", "renamed"))
    assert(back.orderBy("k").collect().toSeq ===
      rows("SELECT k, renamed FROM explake.db.r ORDER BY k"))

    // ... and the SQL faces close the loop end to end: CALL import_delta
    // over the raw (DV + mapped) export materializes exactly the live rows
    rows(s"CALL explake.system.import_delta(`table` => 'db.rback', " +
      s"location => '$dest')")
    assert(rows("SELECT k, renamed FROM explake.db.rback ORDER BY k") ===
      rows("SELECT k, renamed FROM explake.db.r ORDER BY k"))

    // a vector-free unmapped table exports at the v1/v2 floor even raw
    sql("CREATE TABLE explake.db.plain (k BIGINT)")
    sql("INSERT INTO explake.db.plain SELECT id FROM range(0, 10)")
    val dest2 = s"${tmp("delta-export-raw2")}/p"
    rows(s"CALL explake.system.export_delta(`table` => 'db.plain', " +
      s"location => '$dest2', materialize => false)")
    val proto2 = readLog(dest2)(1).get("protocol")
    assert(proto2.get("minReaderVersion").asInt === 1)
    assert(DeltaImport.readSnapshot(spark, dest2).count() === 10L)

    // an EMPTY table raw-exports a valid zero-add log that imports back
    // as an empty frame with the declared schema
    sql("CREATE TABLE explake.db.empty (k BIGINT, v STRING)")
    val dest3 = s"${tmp("delta-export-raw3")}/e"
    val outE = rows(s"CALL explake.system.export_delta(`table` => 'db.empty', " +
      s"location => '$dest3', materialize => false)")
    assert((outE.head.getInt(0), outE.head.getLong(1)) === ((0, 0L)))
    val backE = DeltaImport.readSnapshot(spark, dest3)
    assert(backE.schema.fieldNames.toSeq === Seq("k", "v") && backE.count() === 0L)
  }

  test("raw export of a mapped table annotates NESTED fields with ids and physical names") {
    sql("CREATE NAMESPACE IF NOT EXISTS explake.db")
    // a nested struct (inside an array, too) + a rename that switches the
    // table into name-mode mapping: the spec demands id/physicalName on
    // EVERY struct field, nested included — a reader refuses the table
    // otherwise
    sql("CREATE TABLE explake.db.nested (k BIGINT, " +
      "payload STRUCT<name: STRING, twice: BIGINT>, " +
      "tags ARRAY<STRUCT<t: STRING>>)")
    sql("INSERT INTO explake.db.nested SELECT id, " +
      "named_struct('name', concat('n', id), 'twice', id * 2), " +
      "array(named_struct('t', concat('t', id))) FROM range(0, 30)")
    sql("ALTER TABLE explake.db.nested RENAME COLUMN k TO key")
    val dest = s"${tmp("delta-export-nested")}/n"
    rows(s"CALL explake.system.export_delta(`table` => 'db.nested', " +
      s"location => '$dest', materialize => false)")
    val meta = readLog(dest)(2).get("metaData")
    val schema = DataType.fromJson(meta.get("schemaString").asText)
      .asInstanceOf[StructType]
    def allFields(dt: org.apache.spark.sql.types.DataType): Seq[org.apache.spark.sql.types.StructField] =
      dt match {
        case s: StructType => s.fields.toSeq.flatMap(f => f +: allFields(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => allFields(a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          allFields(m.keyType) ++ allFields(m.valueType)
        case _ => Nil
      }
    val fields = allFields(schema)
    assert(fields.size === 6)   // key, payload, name, twice, tags, t
    fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id") &&
        f.metadata.contains("delta.columnMapping.physicalName"),
        s"field ${f.name} is missing mapping metadata")
    }
    val ids = fields.map(_.metadata.getLong("delta.columnMapping.id"))
    assert(ids.distinct.size === ids.size, s"duplicate mapping ids: $ids")
    assert(meta.get("configuration").get("delta.columnMapping.maxColumnId")
      .asText.toLong === ids.max)
    // nested fields physically store their LOGICAL names; only the renamed
    // top-level column points at a drifted physical name
    val payloadName = schema("payload").dataType.asInstanceOf[StructType]("name")
    assert(payloadName.metadata.getString("delta.columnMapping.physicalName") === "name")
    assert(schema("key").metadata.getString("delta.columnMapping.physicalName") !== "key")
    // the loop still closes: the import reads logical names at every level
    val back = DeltaImport.readSnapshot(spark, dest)
    assert(back.schema.fieldNames.toSeq === Seq("key", "payload", "tags"))
    assert(back.orderBy("key").collect().toSeq ===
      rows("SELECT key, payload, tags FROM explake.db.nested ORDER BY key"))
  }

  test("version export time-travels; refusals are loud") {
    sql("CREATE TABLE explake.db.v (k BIGINT)")
    sql("INSERT INTO explake.db.v SELECT id FROM range(0, 10)")   // v1
    sql("INSERT INTO explake.db.v SELECT id FROM range(10, 30)")  // v2
    // a PRE-CREATED empty destination (mkdir'd dir / object-store prefix)
    // is valid — the write must not trip SaveMode.ErrorIfExists on it
    val preCreated = tmp("delta-export-pre")
    rows(s"CALL explake.system.export_delta(`table` => 'db.v', " +
      s"location => '$preCreated')")
    assert(spark.read.parquet(preCreated).count() === 30L)

    val dest1 = s"${tmp("delta-export-v")}/v1"
    val out = rows(s"CALL explake.system.export_delta(`table` => 'db.v', " +
      s"location => '$dest1', version => 1)")
    assert(out.head.getLong(1) === 10L)
    assert(spark.read.parquet(dest1).count() === 10L)

    // non-empty destination refuses (exports are immutable snapshots)
    val e = intercept[Exception](rows(s"CALL explake.system.export_delta(" +
      s"`table` => 'db.v', location => '$dest1')"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // vacuumed/never-committed version refuses
    val e2 = intercept[Exception](rows(s"CALL explake.system.export_delta(" +
      s"`table` => 'db.v', location => '${tmp("delta-export-bad")}/x', version => 99)"))
    assert(e2.getMessage.contains("out of range"), e2.getMessage)
  }
}
