package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** The inbound half of the Delta interop loop (round-17 verdict item 3):
  *
  *  1. ROUND TRIP — export a graft snapshot (incl. one with deletion
  *     vectors applied and renamed columns, which the export
  *     materializes) and read it back through [[DeltaImport]]: rows and
  *     schema must equal the source snapshot.
  *  2. EXTERNAL LOGS — a hand-written multi-commit log (the protocol
  *     shapes a real Delta writer produces: add + remove churn,
  *     partitionValues, a checkpoint parquet + _last_checkpoint) replays
  *     to exactly the live file set.
  *  3. CAPABILITY GATE — reader features we do not implement (column
  *     mapping, deletion vectors, named readerFeatures) and log gaps are
  *     refused LOUDLY, never mis-read.
  */
class DeltaImportSpec extends LakeSpec {
  protected def catalogName = "implake"

  private def writeText(dir: String, name: String, text: String): Unit = {
    val p = new Path(s"$dir/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"k","type":"long","nullable":true,"metadata":{}},
      |{"name":"v","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  private def metaLine(partitionCols: Seq[String] = Nil,
                       config: String = "{}",
                       schema: String = schemaJson): String =
    s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000000",
       |"format":{"provider":"parquet","options":{}},
       |"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().writeValueAsString(schema)},
       |"partitionColumns":[${partitionCols.map(c => s""""$c"""").mkString(",")}],
       |"configuration":$config,"createdTime":0}}""".stripMargin.replace("\n", "")

  private val protocolLine =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  test("export -> import round trip: plain, and materialized mor + rename") {
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    sql("CREATE TABLE implake.db.t (k BIGINT, v STRING)")
    sql("INSERT INTO implake.db.t SELECT id, concat('v', id) FROM range(0, 120)")
    sql("INSERT INTO implake.db.t SELECT id, concat('v', id) FROM range(120, 150)")
    val dest = s"${tmp("delta-rt")}/t"
    DeltaExport.exportSnapshot(spark, log("db/t"), dest)
    val back = DeltaImport.readSnapshot(spark, dest)
    assert(back.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(back.orderBy("k").collect().toSeq ===
      rows("SELECT k, v FROM implake.db.t ORDER BY k"))
    assert(DeltaImport.snapshot(spark, dest).version === 0L)

    // vectors + logical renames materialize on export; the import must
    // see exactly the live rows under the renamed schema
    sql("CREATE TABLE implake.db.m (k BIGINT, val STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO implake.db.m SELECT id, concat('x', id) FROM range(0, 100)")
    sql("DELETE FROM implake.db.m WHERE k % 3 = 0")
    sql("ALTER TABLE implake.db.m RENAME COLUMN val TO renamed")
    val dest2 = s"${tmp("delta-rt2")}/m"
    DeltaExport.exportSnapshot(spark, log("db/m"), dest2)
    val back2 = DeltaImport.readSnapshot(spark, dest2)
    assert(back2.schema.fieldNames.toSeq === Seq("k", "renamed"))
    assert(back2.orderBy("k").collect().toSeq ===
      rows("SELECT k, renamed FROM implake.db.m ORDER BY k"))
  }

  test("external multi-commit log: add/remove churn and partition values replay") {
    import spark.implicits._
    val dir = tmp("delta-ext")
    // three data files; b.parquet gets removed at v2. Files carry only
    // the data column — `k` comes back from partitionValues.
    Seq(("p1", "a"), ("p1", "b"), ("p2", "c")).foreach { case (part, name) =>
      Seq.tabulate(5)(i => s"$part-$name-$i").toDF("v").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/stage-$name")
      val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val f = fs.listStatus(new Path(s"$dir/stage-$name"))
        .filter(st => st.getPath.getName.endsWith(".parquet")).head.getPath
      fs.mkdirs(new Path(s"$dir/k=$part"))
      fs.rename(f, new Path(s"$dir/k=$part/$name.parquet"))
    }
    val dataOnlySchema =
      """{"type":"struct","fields":[
        |{"name":"v","type":"string","nullable":true,"metadata":{}},
        |{"name":"k","type":"string","nullable":true,"metadata":{}}]}"""
        .stripMargin.replace("\n", "")
    def add(path: String, part: String) =
      s"""{"add":{"path":"$path","partitionValues":{"k":"$part"},"size":1,
         |"modificationTime":0,"dataChange":true}}""".stripMargin.replace("\n", "")
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine(Seq("k"), schema = dataOnlySchema),
        add("k=p1/a.parquet", "p1"), add("k=p1/b.parquet", "p1")).mkString("\n"))
    writeText(s"$dir/_delta_log", f"${1}%020d.json",
      Seq(add("k=p2/c.parquet", "p2")).mkString("\n"))
    writeText(s"$dir/_delta_log", f"${2}%020d.json",
      """{"remove":{"path":"k=p1/b.parquet","dataChange":true}}""")

    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 2L)
    assert(snap.partitionColumns === Seq("k"))
    assert(snap.files.map(_.path).toSet ===
      Set("k=p1/a.parquet", "k=p2/c.parquet"))

    // time travel on import: version 1 still holds the later-removed
    // file; version 0 predates c.parquet; out-of-range refuses
    assert(DeltaImport.snapshot(spark, dir, Some(1L)).files.map(_.path).toSet ===
      Set("k=p1/a.parquet", "k=p1/b.parquet", "k=p2/c.parquet"))
    assert(DeltaImport.snapshot(spark, dir, Some(0L)).files.map(_.path).toSet ===
      Set("k=p1/a.parquet", "k=p1/b.parquet"))
    val eTt = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir, Some(3L))
    }
    assert(eTt.getMessage.contains("out of range"))
    val back = DeltaImport.readSnapshot(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("v", "k"))
    val got = back.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = (0 until 5).flatMap(i =>
      Seq((s"p1-a-$i", "p1"), (s"p2-c-$i", "p2"))).toSet
    assert(got === want)
  }

  test("checkpoint + _last_checkpoint: replay starts from the checkpoint") {
    import spark.implicits._
    val dir = tmp("delta-ckpt")
    Seq.tabulate(7)(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stage")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.listStatus(new Path(s"$dir/stage"))
      .filter(st => st.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(staged, new Path(s"$dir/data.parquet"))

    // checkpoint at v5 carrying protocol + metaData + the single add —
    // NO JSON commits 0..5 exist (vacuumed), so resolution MUST start
    // from the checkpoint; v6 is an empty follow-up commit
    val ckpt = spark.sql(
      s"""SELECT named_struct('minReaderVersion', 1, 'minWriterVersion', 2) AS protocol,
            cast(null AS struct<id:string, format:struct<provider:string>,
              schemaString:string, partitionColumns:array<string>,
              configuration:map<string,string>>) AS metaData,
            cast(null AS struct<path:string, partitionValues:map<string,string>,
              size:bigint>) AS add
          UNION ALL
          SELECT null, named_struct('id', 'x', 'format',
              named_struct('provider', 'parquet'), 'schemaString', '${schemaJson
                .replace("'", "''")}',
              'partitionColumns', array(), 'configuration',
              map_from_arrays(array(), array())), null
          UNION ALL
          SELECT null, null, named_struct('path', 'data.parquet',
            'partitionValues', map_from_arrays(array(), array()), 'size', 1L)""")
    ckpt.coalesce(1).write.mode("overwrite").parquet(s"$dir/ckpt-stage")
    val ckptFile = fs.listStatus(new Path(s"$dir/ckpt-stage"))
      .filter(st => st.getPath.getName.endsWith(".parquet")).head.getPath
    fs.mkdirs(new Path(s"$dir/_delta_log"))
    fs.rename(ckptFile, new Path(s"$dir/_delta_log/${f"${5L}%020d"}.checkpoint.parquet"))
    writeText(s"$dir/_delta_log", "_last_checkpoint", """{"version":5,"size":3}""")
    writeText(s"$dir/_delta_log", f"${6L}%020d.json",
      """{"commitInfo":{"operation":"NOOP"}}""")

    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 6L)
    assert(snap.files.map(_.path) === Seq("data.parquet"))
    val back = DeltaImport.readSnapshot(spark, dir)
    assert(back.orderBy("k").collect().map(_.getString(1)).toSeq ===
      (0 until 7).map(i => s"v$i"))
  }

  test("CALL import_delta materializes an external snapshot as a real graft table") {
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    sql("CREATE TABLE implake.db.src (k BIGINT, v STRING)")
    sql("INSERT INTO implake.db.src SELECT id, concat('v', id) FROM range(0, 80)")
    val dest = s"${tmp("delta-proc")}/t"
    DeltaExport.exportSnapshot(spark, log("db/src"), dest)

    val out = rows(s"CALL implake.system.import_delta(`table` => 'db.imported', " +
      s"location => '$dest')")
    assert(out.size === 1)
    assert(out.head.getLong(1) === 80L, "reported row count")
    assert(out.head.getLong(2) === 0L, "source Delta version")

    // the import IS a normal graft table: queryable, and later writes work
    assert(rows("SELECT k, v FROM implake.db.imported ORDER BY k") ===
      rows("SELECT k, v FROM implake.db.src ORDER BY k"))
    sql("DELETE FROM implake.db.imported WHERE k >= 40")
    assert(rows("SELECT count(*) FROM implake.db.imported").head.getLong(0) === 40L)

    // refusals: existing target; missing namespace (no silent mkdirs)
    val e1 = intercept[Exception] {
      rows(s"CALL implake.system.import_delta(`table` => 'db.imported', " +
        s"location => '$dest')")
    }
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[Exception] {
      rows(s"CALL implake.system.import_delta(`table` => 'nodb.x', " +
        s"location => '$dest')")
    }
    assert(e2.getMessage.contains("namespace"))
    // a bare single-part name would land directly under the warehouse root
    val e3 = intercept[Exception] {
      rows(s"CALL implake.system.import_delta(`table` => 'bare', " +
        s"location => '$dest')")
    }
    assert(e3.getMessage.contains("namespace.table"))
  }

  test("CALL refresh_delta appends only the source's new files, then refuses churn") {
    import spark.implicits._
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    val src = tmp("delta-refresh-src")
    def add(path: String) =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
    stageOne(src, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f0.parquet")
    writeText(s"$src/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine(), add("f0.parquet")).mkString("\n"))
    rows(s"CALL implake.system.import_delta(`table` => 'db.mirror', " +
      s"location => '$src')")
    assert(rows("SELECT count(*) FROM implake.db.mirror").head.getLong(0) === 2L)

    // the source appends a commit -> refresh copies exactly the new file
    stageOne(src, Seq((3L, "c")).toDF("k", "v"), "f1.parquet")
    writeText(s"$src/_delta_log", f"${1}%020d.json", add("f1.parquet"))
    val out = rows("CALL implake.system.refresh_delta(`table` => 'db.mirror')")
    assert((out.head.getInt(0), out.head.getLong(1),
      out.head.getLong(2), out.head.getLong(3)) === ((1, 1L, 0L, 1L)))
    assert(rows("SELECT k, v FROM implake.db.mirror ORDER BY k")
      .map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // caught up: refresh is a no-op, not a re-copy
    val out2 = rows("CALL implake.system.refresh_delta(`table` => 'db.mirror')")
    assert((out2.head.getInt(0), out2.head.getLong(3)) === ((0, 1L)))

    // a brand-NEW file carrying a deletion vector is still an append:
    // its live rows are (file minus vector) — only those arrive
    stageOne(src, Seq((4L, "dead"), (5L, "e")).toDF("k", "v"), "f2.parquet")
    val dvDesc = DeltaDv.inlineDescriptor(Array(0L))   // kills (4, "dead")
    writeText(s"$src/_delta_log", f"${2}%020d.json",
      s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,""" +
        s""""deletionVector":{"storageType":"i","pathOrInlineDv":"${dvDesc.pathOrInlineDv}",""" +
        s""""sizeInBytes":${dvDesc.sizeInBytes},"cardinality":1}}}""")
    val out3 = rows("CALL implake.system.refresh_delta(`table` => 'db.mirror')")
    assert((out3.head.getInt(0), out3.head.getLong(1)) === ((1, 1L)))
    assert(rows("SELECT k FROM implake.db.mirror ORDER BY k").map(_.getLong(0)) ===
      Seq(1L, 2L, 3L, 5L))

    // a retired file is NOT an append-only increment: refuse, point at
    // re-import, and leave the mirror untouched
    writeText(s"$src/_delta_log", f"${3}%020d.json",
      """{"remove":{"path":"f0.parquet","dataChange":true}}""")
    val e = intercept[Exception] {
      rows("CALL implake.system.refresh_delta(`table` => 'db.mirror')")
    }
    assert(e.getMessage.contains("re-import"), e.getMessage)
    assert(rows("SELECT count(*) FROM implake.db.mirror").head.getLong(0) === 4L)

    // a table not created by import_delta has nothing to refresh from
    sql("CREATE TABLE implake.db.nomirror (k BIGINT)")
    val e2 = intercept[Exception] {
      rows("CALL implake.system.refresh_delta(`table` => 'db.nomirror')")
    }
    assert(e2.getMessage.contains("graft.delta.location"), e2.getMessage)
  }

  test("CALL refresh_delta with keys converges DV growth, compaction, and restore") {
    import spark.implicits._
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    val src = tmp("delta-refresh-keyed")
    def addJson(path: String, dv: Option[DeltaDv.Descriptor]) =
      s"""{"add":{"path":"$path","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true""" +
        dv.map(d => s""","deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}"""" +
          d.offset.map(o => s""","offset":$o""").getOrElse("") +
          s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}""").getOrElse("") + "}}"
    def removeJson(path: String, dv: Option[DeltaDv.Descriptor]) =
      s"""{"remove":{"path":"$path","dataChange":true""" +
        dv.map(d => s""","deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}"""" +
          d.offset.map(o => s""","offset":$o""").getOrElse("") +
          s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}""").getOrElse("") + "}}"
    // f0 rows at positions 0..5
    stageOne(src, Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (6L, "f")).toDF("k", "v"), "f0.parquet")
    writeText(s"$src/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine(), addJson("f0.parquet", None)).mkString("\n"))
    rows(s"CALL implake.system.import_delta(`table` => 'db.kmirror', " +
      s"location => '$src')")

    // v1: the source DELETEs k=2 via a deletion vector on f0 — the modern
    // writer shape refresh must survive incrementally
    val dv1 = DeltaDv.inlineDescriptor(Array(1L))
    writeText(s"$src/_delta_log", f"${1}%020d.json",
      Seq(addJson("f0.parquet", Some(dv1)), removeJson("f0.parquet", None))
        .mkString("\n"))
    // without keys: a narrowed refusal that names the fix
    val eNoKeys = intercept[Exception] {
      rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror')")
    }
    assert(eNoKeys.getMessage.contains("keys =>"), eNoKeys.getMessage)
    val r1 = rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror', keys => 'k')")
    assert((r1.head.getLong(1), r1.head.getLong(2), r1.head.getLong(3)) === ((1L, 0L, 1L)))
    assert(rows("SELECT k FROM implake.db.kmirror ORDER BY k").map(_.getLong(0)) ===
      Seq(1L, 3L, 4L, 5L, 6L))

    // v2: COMPACTION — f0 retired, f1 re-adds exactly the live rows.
    // The keyed diff must net to ZERO mirror writes.
    stageOne(src, Seq((1L, "a"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
      .toDF("k", "v"), "f1.parquet")
    writeText(s"$src/_delta_log", f"${2}%020d.json",
      Seq(removeJson("f0.parquet", Some(dv1)), addJson("f1.parquet", None))
        .mkString("\n"))
    val r2 = rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror', keys => 'k')")
    assert((r2.head.getLong(1), r2.head.getLong(3)) === ((0L, 2L)))
    assert(rows("SELECT k FROM implake.db.kmirror ORDER BY k").map(_.getLong(0)) ===
      Seq(1L, 3L, 4L, 5L, 6L))

    // v3: a DV delete (k=5, position 3 of f1) AND a plain append (f2) in
    // one increment — the keyed path carries both through the MERGE
    val dv3 = DeltaDv.inlineDescriptor(Array(3L))
    stageOne(src, Seq((7L, "g")).toDF("k", "v"), "f2.parquet")
    writeText(s"$src/_delta_log", f"${3}%020d.json",
      Seq(addJson("f1.parquet", Some(dv3)), removeJson("f1.parquet", None),
        addJson("f2.parquet", None)).mkString("\n"))
    val r3 = rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror', keys => 'k')")
    assert((r3.head.getInt(0), r3.head.getLong(1), r3.head.getLong(3)) === ((2, 2L, 3L)))
    assert(rows("SELECT k FROM implake.db.kmirror ORDER BY k").map(_.getLong(0)) ===
      Seq(1L, 3L, 4L, 6L, 7L))

    // v4: RESTORE shape — the vector retires and f1's full row set comes
    // back; the reverse diff re-inserts k=5
    writeText(s"$src/_delta_log", f"${4}%020d.json",
      Seq(removeJson("f1.parquet", Some(dv3)), addJson("f1.parquet", None))
        .mkString("\n"))
    val r4 = rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror', keys => 'k')")
    assert(r4.head.getLong(1) === 1L)
    assert(rows("SELECT k, v FROM implake.db.kmirror ORDER BY k")
      .map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "a"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"), (7L, "g")))

    // caught up: keyed refresh is a no-op too
    val r5 = rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror', keys => 'k')")
    assert((r5.head.getInt(0), r5.head.getLong(1), r5.head.getLong(3)) === ((0, 0L, 4L)))

    // CRASH RECOVERY: a keyed refresh that died after its write-ahead
    // intent (version advanced + pendingDiff recorded) but before its
    // MERGEs — simulated by committing exactly that property state — is
    // recovered by the NEXT refresh: the idempotent diff re-runs first
    val dv5 = DeltaDv.inlineDescriptor(Array(1L))   // kills k=3 (pos 1 of f1)
    writeText(s"$src/_delta_log", f"${5}%020d.json",
      Seq(addJson("f1.parquet", Some(dv5)), removeJson("f1.parquet", None))
        .mkString("\n"))
    sql("ALTER TABLE implake.db.kmirror SET TBLPROPERTIES(" +
      "'graft.delta.sourceVersion'='5', 'graft.delta.pendingDiff'='4;k')")
    assert(rows("SELECT k FROM implake.db.kmirror ORDER BY k").map(_.getLong(0))
      .contains(3L), "precondition: the mirror is stale (the crash left k=3)")
    val r6 = rows("CALL implake.system.refresh_delta(`table` => 'db.kmirror', keys => 'k')")
    assert((r6.head.getLong(1), r6.head.getLong(3)) === ((0L, 5L)),
      "after recovery the call's own increment is empty")
    assert(rows("SELECT k FROM implake.db.kmirror ORDER BY k").map(_.getLong(0)) ===
      Seq(1L, 4L, 5L, 6L, 7L), "recovery applied the crashed diff")
    assert(!log("db/kmirror").latestVersion.map(v => log("db/kmirror").metaAt(v)._2)
      .exists(_.contains("graft.delta.pendingDiff")), "the intent is retired")
  }

  test("recovery of an unreplayable crashed diff refuses loudly; clearing the intent unwedges") {
    import spark.implicits._
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    val src = tmp("delta-refresh-wedge")
    stageOne(src, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f0.parquet")
    writeText(s"$src/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine(),
        """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
        .mkString("\n"))
    rows(s"CALL implake.system.import_delta(`table` => 'db.wmirror', " +
      s"location => '$src')")

    // v1 appends f1; a keyed refresh CLAIMED 0->1 (write-ahead intent
    // committed) and died before its MERGEs ran
    stageOne(src, Seq((3L, "c")).toDF("k", "v"), "f1.parquet")
    writeText(s"$src/_delta_log", f"${1}%020d.json",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    sql("ALTER TABLE implake.db.wmirror SET TBLPROPERTIES(" +
      "'graft.delta.sourceVersion'='1', 'graft.delta.pendingDiff'='0;k')")

    // the source VACUUMS its history: a checkpoint at v1 replaces the
    // JSON commits, so the claimed diff's FROM version (0) can no longer
    // be resolved — only the head can
    val fs = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckpt = spark.sql(
      s"""SELECT named_struct('minReaderVersion', 1, 'minWriterVersion', 2) AS protocol,
            cast(null AS struct<id:string, format:struct<provider:string>,
              schemaString:string, partitionColumns:array<string>,
              configuration:map<string,string>>) AS metaData,
            cast(null AS struct<path:string, partitionValues:map<string,string>,
              size:bigint>) AS add
          UNION ALL
          SELECT null, named_struct('id', 'x', 'format',
              named_struct('provider', 'parquet'), 'schemaString', '${schemaJson
                .replace("'", "''")}',
              'partitionColumns', array(), 'configuration',
              map_from_arrays(array(), array())), null
          UNION ALL
          SELECT null, null, named_struct('path', 'f0.parquet',
            'partitionValues', map_from_arrays(array(), array()), 'size', 1L)
          UNION ALL
          SELECT null, null, named_struct('path', 'f1.parquet',
            'partitionValues', map_from_arrays(array(), array()), 'size', 1L)""")
    ckpt.coalesce(1).write.mode("overwrite").parquet(s"$src/ckpt-stage")
    val ckptFile = fs.listStatus(new Path(s"$src/ckpt-stage"))
      .filter(st => st.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(ckptFile,
      new Path(s"$src/_delta_log/${f"${1L}%020d"}.checkpoint.parquet"))
    writeText(s"$src/_delta_log", "_last_checkpoint", """{"version":1,"size":4}""")
    fs.delete(new Path(s"$src/_delta_log/${f"${0L}%020d"}.json"), false)
    fs.delete(new Path(s"$src/_delta_log/${f"${1L}%020d"}.json"), false)

    // recovery cannot replay the claimed diff: the refusal names the
    // intent and the ways out, and the mirror is untouched — NOT silently
    // wedged, NOT silently skipped
    val e = intercept[Exception] {
      rows("CALL implake.system.refresh_delta(`table` => 'db.wmirror', keys => 'k')")
    }
    assert(e.getMessage.contains("crashed keyed refresh"), e.getMessage)
    assert(e.getMessage.contains("graft.delta.pendingDiff"), e.getMessage)
    assert(rows("SELECT count(*) FROM implake.db.wmirror").head.getLong(0) === 2L)

    // the operator ACCEPTS THE GAP exactly as the message says: clearing
    // the intent unwedges the table (recorded v1 == head v1 -> no-op)
    sql("ALTER TABLE implake.db.wmirror UNSET TBLPROPERTIES " +
      "('graft.delta.pendingDiff')")
    val r = rows(
      "CALL implake.system.refresh_delta(`table` => 'db.wmirror', keys => 'k')")
    assert((r.head.getInt(0), r.head.getLong(1), r.head.getLong(3)) === ((0, 0L, 1L)))
  }

  test("a failed import drops the half-created table so the retry is clean") {
    import spark.implicits._
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    val dir = tmp("delta-orphan")
    // the log names a data file that does not exist: the copy fails AFTER
    // the table log was created — without cleanup, every retry would
    // refuse with "already exists" until a manual drop
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(protocolLine, metaLine(),
      """{"add":{"path":"missing.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
      .mkString("\n"))
    intercept[Exception] {
      rows(s"CALL implake.system.import_delta(`table` => 'db.orphan', " +
        s"location => '$dir')")
    }
    // fix the source and RETRY into the same name — must succeed, proving
    // the failed attempt left no orphaned table behind
    stageOne(dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "missing.parquet")
    val out = rows(s"CALL implake.system.import_delta(`table` => 'db.orphan', " +
      s"location => '$dir')")
    assert(out.head.getLong(1) === 2L)
    assert(rows("SELECT count(*) FROM implake.db.orphan").head.getLong(0) === 2L)
  }

  test("incomplete multi-part checkpoints never stand in for the log") {
    import spark.implicits._
    // commits 0..2 exist; a HALF-UPLOADED 2-part checkpoint at v2 (only
    // part 1 of 2 present) must be skipped by the listing fallback — the
    // JSON replay still resolves the correct state
    val dir = tmp("delta-mp")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stage")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.listStatus(new Path(s"$dir/stage"))
      .filter(st => st.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(staged, new Path(s"$dir/data.parquet"))
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine()).mkString("\n"))
    writeText(s"$dir/_delta_log", f"${1}%020d.json",
      """{"add":{"path":"data.parquet","partitionValues":{},"size":1}}""")
    writeText(s"$dir/_delta_log", f"${2}%020d.json",
      """{"commitInfo":{"operation":"NOOP"}}""")
    writeText(s"$dir/_delta_log",
      f"${2L}%020d.checkpoint.${1}%010d.${2}%010d.parquet", "not real parquet")
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 2L)
    assert(snap.files.map(_.path) === Seq("data.parquet"))

    // ... but _last_checkpoint NAMING the incomplete checkpoint is
    // corruption (it is written only after completion) and refuses
    writeText(s"$dir/_delta_log", "_last_checkpoint", """{"version":2,"size":3}""")
    val e1 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir)
    }
    assert(e1.getMessage.contains("incomplete"))

    // v2/UUID checkpoint names are a reader feature we refuse by name
    val dir2 = tmp("delta-uuid")
    writeText(s"$dir2/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine()).mkString("\n"))
    writeText(s"$dir2/_delta_log",
      f"${0}%020d.checkpoint.80a083e8-7026.parquet", "x")
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir2)
    }
    assert(e2.getMessage.contains("unrecognized checkpoint"))
  }

  test("v2 UUID checkpoints: sidecar and inline manifests replay; holes refuse") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = tmp("delta-v2cp")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("f0", "f1", "f2").zipWithIndex.foreach { case (n, i) =>
      stageOne(dir, Seq((i.toLong, n)).toDF("k", "v"), s"$n.parquet")
    }
    val protoV2 =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""
    def add(p: String) =
      s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      Seq(protoV2, metaLine(), add("f0.parquet")).mkString("\n"))
    writeText(s"$dir/_delta_log", f"${1}%020d.json",
      Seq(add("f1.parquet"),
        """{"remove":{"path":"f0.parquet","dataChange":true}}""").mkString("\n"))

    // v2 checkpoint at version 1: a UUID-named parquet manifest carrying
    // protocol + metaData + checkpointMetadata + one `sidecar` action; the
    // file actions live in _delta_log/_sidecars/sc1.parquet (which also
    // carries f0's remove TOMBSTONE — checkpoints never replay removes)
    val manifestSchema = StructType(Seq(
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType), StructField("sizeInBytes", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType)))),
        nullable = true),
      StructField("metaData", StructType(Seq(
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("format", StructType(Seq(StructField("provider", StringType)))))))))
    val rs = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rs.add(org.apache.spark.sql.Row(org.apache.spark.sql.Row(1L), null, null, null))
    rs.add(org.apache.spark.sql.Row(null,
      org.apache.spark.sql.Row("sc1.parquet", 1L), null, null))
    rs.add(org.apache.spark.sql.Row(null, null,
      org.apache.spark.sql.Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")), null))
    rs.add(org.apache.spark.sql.Row(null, null, null,
      org.apache.spark.sql.Row(schemaJson, Seq.empty[String],
        Map.empty[String, String], org.apache.spark.sql.Row("parquet"))))
    val sidecarSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType))))),
      StructField("remove", StructType(Seq(StructField("path", StringType))))))
    val scRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    scRows.add(org.apache.spark.sql.Row(
      org.apache.spark.sql.Row("f1.parquet", Map.empty[String, String]), null))
    scRows.add(org.apache.spark.sql.Row(null, org.apache.spark.sql.Row("f0.parquet")))
    stageOne(dir, spark.createDataFrame(scRows, sidecarSchema),
      "_delta_log/_sidecars/sc1.parquet")
    val uuid = "7d5a1f2e-3b4c-4d5e-8f9a-0b1c2d3e4f5a"
    stageOne(dir, spark.createDataFrame(rs, manifestSchema),
      s"_delta_log/${"0" * 19}1.checkpoint.$uuid.parquet")
    writeText(s"$dir/_delta_log", "_last_checkpoint", """{"version":1}""")
    writeText(s"$dir/_delta_log", f"${2}%020d.json", add("f2.parquet"))

    // the checkpoint must actually STAND IN for the vacuumed prefix
    fs.delete(new Path(s"$dir/_delta_log/${f"${0}%020d"}.json"), false)
    fs.delete(new Path(s"$dir/_delta_log/${f"${1}%020d"}.json"), false)
    val snap = DeltaImport.snapshot(spark, dir)
    assert(snap.version === 2L)
    assert(snap.files.map(_.path).toSet === Set("f1.parquet", "f2.parquet"))
    assert(DeltaImport.readSnapshot(spark, dir, snap).orderBy("k").collect()
      .map(_.getString(1)).toSeq === Seq("f1", "f2"))

    // a JSON v2 manifest with INLINE file actions (no sidecars) replays too
    val dir2 = tmp("delta-v2cp-json")
    stageOne(dir2, Seq((1L, "a")).toDF("k", "v"), "g0.parquet")
    writeText(s"$dir2/_delta_log",
      s"${"0" * 20}.checkpoint.$uuid.json",
      Seq("""{"checkpointMetadata":{"version":0}}""", protoV2, metaLine(),
        """{"add":{"path":"g0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
        .mkString("\n"))
    writeText(s"$dir2/_delta_log", "_last_checkpoint", """{"version":0}""")
    val snap2 = DeltaImport.snapshot(spark, dir2)
    assert(snap2.version === 0L && snap2.files.map(_.path) === Seq("g0.parquet"))

    // a manifest naming a MISSING sidecar is a partial state: refuse loudly
    val dir3 = tmp("delta-v2cp-hole")
    writeText(s"$dir3/_delta_log",
      s"${"0" * 20}.checkpoint.$uuid.json",
      Seq("""{"checkpointMetadata":{"version":0}}""", protoV2, metaLine(),
        """{"sidecar":{"path":"missing.parquet","sizeInBytes":1}}""")
        .mkString("\n"))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir3)
    }
    assert(e.getMessage.contains("sidecar"), e.getMessage)

    // a checkpointMetadata version that contradicts the file name is
    // corruption, not a race
    val dir4 = tmp("delta-v2cp-ver")
    writeText(s"$dir4/_delta_log",
      s"${"0" * 20}.checkpoint.$uuid.json",
      Seq("""{"checkpointMetadata":{"version":7}}""", protoV2, metaLine())
        .mkString("\n"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir4)
    }
    assert(e2.getMessage.contains("checkpointMetadata"), e2.getMessage)

    // COEXISTENCE: a classic multi-part "compatibility" checkpoint at the
    // same version as the v2 manifest (spec-legal) — the v2 manifest is
    // preferred (the classic parts here are garbage bytes, so reading
    // them would fail loudly), and _last_checkpoint's `parts` count
    // describes the CLASSIC set without tripping over the v2 name
    val dir5 = tmp("delta-v2cp-coexist")
    stageOne(dir5, Seq((9L, "z")).toDF("k", "v"), "h0.parquet")
    writeText(s"$dir5/_delta_log",
      s"${"0" * 20}.checkpoint.$uuid.json",
      Seq("""{"checkpointMetadata":{"version":0}}""", protoV2, metaLine(),
        """{"add":{"path":"h0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
        .mkString("\n"))
    writeText(s"$dir5/_delta_log",
      f"${0L}%020d.checkpoint.${1}%010d.${2}%010d.parquet", "not parquet")
    writeText(s"$dir5/_delta_log",
      f"${0L}%020d.checkpoint.${2}%010d.${2}%010d.parquet", "not parquet")
    writeText(s"$dir5/_delta_log", "_last_checkpoint",
      """{"version":0,"parts":2}""")
    val snap5 = DeltaImport.snapshot(spark, dir5)
    assert(snap5.version === 0L && snap5.files.map(_.path) === Seq("h0.parquet"))
    assert(DeltaImport.readSnapshot(spark, dir5, snap5).collect()
      .map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("capability gate: unsupported features and log gaps refuse loudly") {
    def freshLog(lines: Seq[String], name: String): String = {
      val dir = tmp(name)
      writeText(s"$dir/_delta_log", f"${0}%020d.json", lines.mkString("\n"))
      dir
    }
    // v3 with a reader feature we do NOT implement (deletionVectors,
    // columnMapping, and v2Checkpoint are implemented now; typeWidening
    // is not)
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, freshLog(Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","v2Checkpoint","typeWidening"]}}""",
        metaLine()), "delta-gate2"))
    }
    assert(e2.getMessage.contains("typeWidening"))
    assert(!e2.getMessage.contains("deletionVectors") &&
      !e2.getMessage.contains("v2Checkpoint"))
    // an unknown future column-mapping mode refuses by name
    val e3 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, freshLog(Seq(protocolLine,
        metaLine(config = """{"delta.columnMapping.mode":"hypothetical"}""")), "delta-gate3"))
    }
    assert(e3.getMessage.contains("'hypothetical'"))
    // an unknown deletion-vector storageType
    val e4 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, freshLog(Seq(protocolLine, metaLine(),
        """{"add":{"path":"a.parquet","partitionValues":{},"size":1,
          |"deletionVector":{"storageType":"z","pathOrInlineDv":"x","offset":1,
          |"sizeInBytes":40,"cardinality":2}}}""".stripMargin.replace("\n", "")),
        "delta-gate4"))
    }
    assert(e4.getMessage.contains("storageType"))
    // a non-parquet format provider refuses (reading it as parquet would
    // be garbage, not an error)
    val e6 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, freshLog(Seq(protocolLine,
        metaLine().replace(""""provider":"parquet"""", """"provider":"orc"""")),
        "delta-gate6"))
    }
    assert(e6.getMessage.contains("'orc'"))
    // version gap: commit 0 and 2, no 1
    val dir = tmp("delta-gap")
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine()).mkString("\n"))
    writeText(s"$dir/_delta_log", f"${2}%020d.json",
      """{"add":{"path":"a.parquet","partitionValues":{},"size":1}}""")
    val e5 = intercept[IllegalArgumentException] {
      DeltaImport.snapshot(spark, dir)
    }
    assert(e5.getMessage.contains("no commit 1"))
  }

  // ---- writes one staged single parquet file and returns its name ----------
  private def stageOne(dir: String, df: org.apache.spark.sql.DataFrame,
                       target: String): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/__stage")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val f = fs.listStatus(new Path(s"$dir/__stage"))
      .filter(st => st.getPath.getName.endsWith(".parquet")).head.getPath
    val t = new Path(s"$dir/$target")
    fs.mkdirs(t.getParent)
    fs.rename(f, t)
    fs.delete(new Path(s"$dir/__stage"), true)
  }

  test("deletion vectors: on-disk and inline vectors subtract row positions") {
    import spark.implicits._
    val dir = tmp("delta-dv")
    // two files of 100 rows each, k = 0..99 / 100..199 in row order
    stageOne(dir, (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .sortWithinPartitions("k"), "a.parquet")
    stageOne(dir, (100L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
      .sortWithinPartitions("k"), "b.parquet")
    // a: delete positions where k % 3 == 0 (on-disk 'u' with a prefix);
    // b: delete positions 0..4 (inline 'i')
    val posA = (0L until 100L).filter(_ % 3 == 0).toArray
    val conf = spark.sparkContext.hadoopConfiguration
    val Seq(descA) = DeltaDv.writeFile(dir, conf, Seq(posA), prefix = "xy")
    val descB = DeltaDv.inlineDescriptor(Array(0L, 1L, 2L, 3L, 4L))
    def dvJson(d: DeltaDv.Descriptor): String =
      s"""{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}"""" +
        d.offset.map(o => s""","offset":$o""").getOrElse("") +
        s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine(),
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":${dvJson(descA)}}}""",
      s"""{"add":{"path":"b.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":${dvJson(descB)}}}""")
      .mkString("\n"))
    val back = DeltaImport.readSnapshot(spark, dir)
    val want = (0L until 100L).filter(_ % 3 != 0) ++ (105L until 200L)
    assert(back.orderBy("k").collect().map(_.getLong(0)).toSeq === want)
    assert(back.schema.fieldNames.toSeq === Seq("k", "v"))
    // the DV anti-join exchanges an 8-byte xxhash64 of the file path, not
    // the path string itself
    val plan = back.queryExecution.optimizedPlan.toString
    assert(plan.contains("xxhash64"), s"expected a hashed anti-join key in:\n$plan")

    // a later commit REPLACING a's vector (the Delta shape for a second
    // DELETE: remove + re-add with the union vector) must subtract the
    // new set, not the old
    val posA2 = (0L until 100L).filter(i => i % 3 == 0 || i % 7 == 0).toArray
    val Seq(descA2) = DeltaDv.writeFile(dir, conf, Seq(posA2))
    writeText(s"$dir/_delta_log", f"${1}%020d.json", Seq(
      // a conformant DV-update remove carries the RETIRED vector's
      // descriptor — reconciliation is by (path, dv.uniqueId)
      s"""{"remove":{"path":"a.parquet","dataChange":true,"deletionVector":${dvJson(descA)}}}""",
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":${dvJson(descA2)}}}""")
      .mkString("\n"))
    val want2 = (0L until 100L).filter(i => i % 3 != 0 && i % 7 != 0) ++ (105L until 200L)
    assert(DeltaImport.readSnapshot(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq === want2)
    // time travel still sees version 0's vector
    assert(DeltaImport.readSnapshot(spark, dir,
        DeltaImport.snapshot(spark, dir, Some(0L)))
      .orderBy("k").collect().map(_.getLong(0)).toSeq === want)

    // ADD-BEFORE-REMOVE ordering of the same DV-update commit: the
    // protocol reconciles file actions by (path, deletionVector.uniqueId),
    // so the remove(oldDV) must cancel only version 1's entry and leave
    // the new add live — keyed by path alone, the file (and all its rows)
    // would silently vanish
    val posA3 = (0L until 100L).filter(i => i % 3 == 0 || i % 7 == 0 || i == 1L).toArray
    val Seq(descA3) = DeltaDv.writeFile(dir, conf, Seq(posA3))
    writeText(s"$dir/_delta_log", f"${2}%020d.json", Seq(
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":${dvJson(descA3)}}}""",
      s"""{"remove":{"path":"a.parquet","dataChange":true,"deletionVector":${dvJson(descA2)}}}""")
      .mkString("\n"))
    val snap3 = DeltaImport.snapshot(spark, dir)
    assert(snap3.files.map(_.path).toSet === Set("a.parquet", "b.parquet"))
    val want3 = (0L until 100L)
      .filter(i => i % 3 != 0 && i % 7 != 0 && i != 1L) ++ (105L until 200L)
    assert(DeltaImport.readSnapshot(spark, dir, snap3).orderBy("k").collect()
      .map(_.getLong(0)).toSeq === want3)
  }

  test("column mapping (name mode): physical names project back to logical") {
    import spark.implicits._
    val dir = tmp("delta-cm")
    // the parquet file carries PHYSICAL names, incl. a NESTED rename
    stageOne(dir, (0L until 50L).map(i => (i, (s"n$i", i * 2)))
      .toDF("col-aa11", "col-bb22")
      .select(col("col-aa11"), col("col-bb22").as("col-bb22")
        .cast("struct<`col-cc33`:string,`col-dd44`:bigint>")),
      "part=0/d.parquet")
    val mapped =
      """{"type":"struct","fields":[
        |{"name":"k","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-aa11"}},
        |{"name":"payload","type":{"type":"struct","fields":[
        |{"name":"name","type":"string","nullable":true,"metadata":{"delta.columnMapping.id":3,"delta.columnMapping.physicalName":"col-cc33"}},
        |{"name":"twice","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":4,"delta.columnMapping.physicalName":"col-dd44"}}]},
        |"nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-bb22"}},
        |{"name":"part","type":"string","nullable":true,"metadata":{"delta.columnMapping.id":5,"delta.columnMapping.physicalName":"col-ee55"}}]}"""
        .stripMargin.replace("\n", "")
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(Seq("part"), config = """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"5"}""",
        schema = mapped),
      // partitionValues keyed by the PHYSICAL partition column name
      """{"add":{"path":"part=0/d.parquet","partitionValues":{"col-ee55":"zero"},"size":1,"modificationTime":0,"dataChange":true}}""")
      .mkString("\n"))
    val back = DeltaImport.readSnapshot(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("k", "payload", "part"))
    assert(back.schema("payload").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("name", "twice"))
    val r = back.orderBy("k").collect()
    assert(r.length === 50)
    assert(r.head.getString(2) === "zero")
    assert(r(3).getStruct(1).getString(0) === "n3")
    assert(r(3).getStruct(1).getLong(1) === 6L)
  }

  test("column mapping (id mode): files match by parquet field id, not name") {
    import org.apache.spark.sql.types._
    val dir = tmp("delta-cmid")
    // the file's column NAMES are garbage; only its parquet field ids tie
    // columns to the schema — the exact drift id mode exists to survive
    val writeSchema = StructType(Seq(
      StructField("totally_unrelated_a", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("totally_unrelated_b", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    val data: java.util.List[org.apache.spark.sql.Row] =
      new java.util.ArrayList[org.apache.spark.sql.Row]()
    (0L until 40L).foreach(i => data.add(org.apache.spark.sql.Row(i, s"v$i")))
    stageOne(dir, spark.createDataFrame(data, writeSchema), "d.parquet")
    val mapped =
      """{"type":"struct","fields":[
        |{"name":"k","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-id1"}},
        |{"name":"v","type":"string","nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-id2"}}]}"""
        .stripMargin.replace("\n", "")
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(config = """{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"}""",
        schema = mapped),
      """{"add":{"path":"d.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
      .mkString("\n"))
    val back = DeltaImport.readSnapshot(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === (0L until 40L).map(i => (i, s"v$i")))

    // the eager procedure faces SCOPE the session flag an id-mode read
    // needs: unset before, still unset after — while the copy itself read
    // by field id (40 rows landed, proving the flag was on DURING)
    sql("CREATE NAMESPACE IF NOT EXISTS implake.db")
    spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    rows(s"CALL implake.system.import_delta(`table` => 'db.idmode', " +
      s"location => '$dir')")
    assert(rows("SELECT count(*) FROM implake.db.idmode").head.getLong(0) === 40L)
    assert(spark.conf.get("spark.sql.parquet.fieldId.read.enabled") === "false",
      "import_delta must restore the session conf it scoped")

    // a file carrying NO field ids must fail loudly in id mode, never null
    import spark.implicits._
    stageOne(dir, Seq((99L, "x")).toDF("a", "b"), "noid.parquet")
    writeText(s"$dir/_delta_log", f"${1}%020d.json",
      """{"add":{"path":"noid.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    val e = intercept[Exception] {
      DeltaImport.readSnapshot(spark, dir).collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ").toLowerCase
    assert(messages.contains("field id"),
      s"expected a loud missing-field-id failure, got: $messages")
  }

  test("timestampNtz and vacuumProtocolCheck tables import; their values round-trip") {
    import spark.implicits._
    val dir = tmp("delta-ntz")
    stageOne(dir,
      Seq((1L, java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15)),
          (2L, java.time.LocalDateTime.of(2025, 7, 4, 0, 0, 1)))
        .toDF("k", "ts"),
      "d.parquet")
    val ntzSchema =
      """{"type":"struct","fields":[
        |{"name":"k","type":"long","nullable":true,"metadata":{}},
        |{"name":"ts","type":"timestamp_ntz","nullable":true,"metadata":{}}]}"""
        .stripMargin.replace("\n", "")
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz","vacuumProtocolCheck"],"writerFeatures":["timestampNtz","vacuumProtocolCheck"]}}""",
      metaLine(schema = ntzSchema),
      """{"add":{"path":"d.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
      .mkString("\n"))
    val back = DeltaImport.readSnapshot(spark, dir)
    assert(back.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(back.orderBy("k").collect().map(_.getAs[java.time.LocalDateTime]("ts")).toSeq ===
      Seq(java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15),
          java.time.LocalDateTime.of(2025, 7, 4, 0, 0, 1)))
  }

  test("file names with spaces and percent signs resolve (url-encoded add.path)") {
    import spark.implicits._
    val dir = tmp("delta-enc")
    stageOne(dir, Seq((1L, "a")).toDF("k", "v"), "my file.parquet")
    stageOne(dir, Seq((2L, "b")).toDF("k", "v"), "pct%file.parquet")
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      protocolLine, metaLine(),
      // url-encoded relative path, as real writers emit
      """{"add":{"path":"my%20file.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""",
      """{"add":{"path":"pct%25file.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
      .mkString("\n"))
    assert(DeltaImport.readSnapshot(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("a 100-partition import plans ONE scan, not a union per partition") {
    import spark.implicits._
    val dir = tmp("delta-wide")
    // one Spark write job -> 100 hive dirs, one file each
    (0L until 100L).map(i => (i, i % 100)).toDF("k", "p")
      .write.partitionBy("p").mode("overwrite").parquet(s"$dir/stage")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val adds = fs.listStatus(new Path(s"$dir/stage"))
      .filter(_.isDirectory).flatMap { d =>
        val p = d.getPath.getName.stripPrefix("p=")
        fs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val rel = s"stage/${d.getPath.getName}/${f.getPath.getName}"
            s"""{"add":{"path":"$rel","partitionValues":{"p":"$p"},"size":1,"modificationTime":0,"dataChange":true}}"""
          }
      }
    val schemaP =
      """{"type":"struct","fields":[
        |{"name":"k","type":"long","nullable":true,"metadata":{}},
        |{"name":"p","type":"long","nullable":true,"metadata":{}}]}"""
        .stripMargin.replace("\n", "")
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      (Seq(protocolLine, metaLine(Seq("p"), schema = schemaP)) ++ adds).mkString("\n"))
    val back = DeltaImport.readSnapshot(spark, dir)
    // count scan LEAVES in the optimized plan (AQE hides physical children)
    val plan = back.queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
    }
    // 2 = the data scan + the broadcast partition-value map (a local
    // relation may or may not count depending on its plan shape) — the
    // point is NO per-partition union legs
    assert(scans.size <= 2, s"expected a bounded scan count, got:\n$plan")
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      (0L until 100L).map(i => (i, i % 100)).toSet)
  }
}
