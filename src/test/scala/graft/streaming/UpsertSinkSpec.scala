package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The foreachBatch merge sink maintains a current-state parquet table with
  * latest-wins semantics across micro-batches, and re-merging a batch is a
  * no-op (idempotence under replay).
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.KeyedEvent

  test("streamed upserts fold into the state table; replay is idempotent") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sink").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op")
    val mem = MemoryStream[KeyedEvent]
    val q = sink.attach(mem.toDS()).outputMode("append").start()

    mem.addData(KeyedEvent("a", 1, "upsert", "v1"),
                KeyedEvent("b", 2, "upsert", "w1"))
    q.processAllAvailable()
    mem.addData(KeyedEvent("a", 3, "upsert", "v2"),
                KeyedEvent("b", 4, "delete", null),
                KeyedEvent("c", 5, "upsert", "x1"))
    q.processAllAvailable()
    q.stop()

    val state = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(state == List(("a", "v2"), ("c", "x1")))

    // replay the second batch manually — merging the same rows again must
    // leave the state unchanged
    sink.merge(Seq(
      ("a", 3L, "upsert", "v2"), ("b", 4L, "delete", null), ("c", 5L, "upsert", "x1"))
      .toDF("key", "seq", "op", "payload"), batchId = 99L)
    val replayed = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(replayed == state)
  }
}
