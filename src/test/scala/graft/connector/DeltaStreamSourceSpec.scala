package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQueryException

/** The streaming face over an external `_delta_log`
  * ([[DeltaImportProvider]], format "delta-import"): snapshot as the first
  * batch, append-only increments after, checkpoint resume at the committed
  * Delta version, and LOUD refusals for everything a scan-only micro-batch
  * cannot express (deletion vectors, retired files, partition columns,
  * id-mode mapping).
  */
class DeltaStreamSourceSpec extends LakeSpec {
  protected def catalogName = "dslake"

  private def writeText(dir: String, name: String, text: String): Unit = {
    val p = new Path(s"$dir/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

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

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"k","type":"long","nullable":true,"metadata":{}},
      |{"name":"v","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  private def metaLine(config: String = "{}", schema: String = schemaJson): String =
    s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000000",
       |"format":{"provider":"parquet","options":{}},
       |"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().writeValueAsString(schema)},
       |"partitionColumns":[],"configuration":$config,"createdTime":0}}"""
      .stripMargin.replace("\n", "")

  private val protocolLine =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def add(p: String) =
    s"""{"add":{"path":"$p","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""

  test("snapshot first, appends after, checkpoint resume at the committed version") {
    import spark.implicits._
    val dir = tmp("dstream")
    stageOne(dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f0.parquet")
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine(), add("f0.parquet")).mkString("\n"))

    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val ckpt = tmp("dstream-ckpt")
    def start() = spark.readStream.format("delta-import").option("path", dir)
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    val q = start()
    q.processAllAvailable()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(1L, 2L),
      "first batch = the current snapshot")

    // an appended commit arrives exactly once
    stageOne(dir, Seq((3L, "c")).toDF("k", "v"), "f1.parquet")
    writeText(s"$dir/_delta_log", f"${1}%020d.json", add("f1.parquet"))
    q.processAllAvailable()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(1L, 2L, 3L))
    q.stop()

    // appends land while the stream is DOWN; the restart resumes at the
    // committed version and emits only the gap
    stageOne(dir, Seq((4L, "d")).toDF("k", "v"), "f2.parquet")
    writeText(s"$dir/_delta_log", f"${2}%020d.json", add("f2.parquet"))
    got.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(4L),
      "resume must emit exactly the missed appends, not the snapshot again")
  }

  test("non-append source changes fail the stream loudly") {
    import spark.implicits._
    // a DV landing on an already-streamed file
    val dir = tmp("dstream-dv")
    stageOne(dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f0.parquet")
    writeText(s"$dir/_delta_log", f"${0}%020d.json",
      Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
        metaLine(), add("f0.parquet")).mkString("\n"))
    val q = spark.readStream.format("delta-import").option("path", dir)
      .load().writeStream
      .option("checkpointLocation", tmp("dstream-dv-ckpt"))
      .format("noop").start()
    q.processAllAvailable()
    val dv = DeltaDv.inlineDescriptor(Array(0L))
    writeText(s"$dir/_delta_log", f"${1}%020d.json", Seq(
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${dv.pathOrInlineDv}","sizeInBytes":${dv.sizeInBytes},"cardinality":1}}}""",
      """{"remove":{"path":"f0.parquet","dataChange":true}}""").mkString("\n"))
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    q.stop()
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("deletion vector"), msgs)

    // a retired file (compaction/DELETE rewrite)
    val dir2 = tmp("dstream-rm")
    stageOne(dir2, Seq((1L, "a")).toDF("k", "v"), "f0.parquet")
    writeText(s"$dir2/_delta_log", f"${0}%020d.json",
      Seq(protocolLine, metaLine(), add("f0.parquet")).mkString("\n"))
    val q2 = spark.readStream.format("delta-import").option("path", dir2)
      .load().writeStream
      .option("checkpointLocation", tmp("dstream-rm-ckpt"))
      .format("noop").start()
    q2.processAllAvailable()
    writeText(s"$dir2/_delta_log", f"${1}%020d.json",
      """{"remove":{"path":"f0.parquet","dataChange":true}}""")
    val e2 = intercept[StreamingQueryException] { q2.processAllAvailable() }
    q2.stop()
    val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs2.contains("retired"), msgs2)
  }

  test("construction refusals: vectored snapshots, partitions, id mode") {
    import spark.implicits._
    // deletion vectors in the CURRENT snapshot
    val dir = tmp("dstream-gate1")
    stageOne(dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "f0.parquet")
    val dv = DeltaDv.inlineDescriptor(Array(0L))
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaLine(),
      s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${dv.pathOrInlineDv}","sizeInBytes":${dv.sizeInBytes},"cardinality":1}}}""")
      .mkString("\n"))
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("delta-import").option("path", dir).load()
    }
    assert(e.getMessage.contains("deletion"), e.getMessage)

    // hive partition columns
    val dir2 = tmp("dstream-gate2")
    writeText(s"$dir2/_delta_log", f"${0}%020d.json", Seq(protocolLine,
      metaLine().replace(""""partitionColumns":[]""", """"partitionColumns":["k"]"""))
      .mkString("\n"))
    val e2 = intercept[IllegalArgumentException] {
      spark.readStream.format("delta-import").option("path", dir2).load()
    }
    assert(e2.getMessage.contains("partition"), e2.getMessage)

    // id-mode column mapping
    val dir3 = tmp("dstream-gate3")
    writeText(s"$dir3/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(config = """{"delta.columnMapping.mode":"id"}""")).mkString("\n"))
    val e3 = intercept[IllegalArgumentException] {
      spark.readStream.format("delta-import").option("path", dir3).load()
    }
    assert(e3.getMessage.contains("id-mode"), e3.getMessage)
  }

  test("name-mode column mapping streams logical names over physical files") {
    import spark.implicits._
    val dir = tmp("dstream-cm")
    stageOne(dir, Seq((1L, "a"), (2L, "b")).toDF("col-x1", "col-x2"), "f0.parquet")
    val mapped =
      """{"type":"struct","fields":[
        |{"name":"k","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-x1"}},
        |{"name":"v","type":"string","nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-x2"}}]}"""
        .stripMargin.replace("\n", "")
    writeText(s"$dir/_delta_log", f"${0}%020d.json", Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(config = """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"}""",
        schema = mapped),
      add("f0.parquet")).mkString("\n"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val stream = spark.readStream.format("delta-import").option("path", dir).load()
    assert(stream.schema.fieldNames.toSeq === Seq("k", "v"))
    val q = stream.writeStream
      .option("checkpointLocation", tmp("dstream-cm-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.collect().foreach(r => got.add((r.getLong(0), r.getString(1)))); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(got.toArray.map(_.asInstanceOf[(Long, String)]).sorted.toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }
}
