package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T4: resume-from-checkpoint — a restarted query recovers its keyed state
  * from the checkpoint and continues the fold (the reference's
  * last_streamed_block resume, stream_blocks.py:161-199). The memory sink
  * can't recover, so output goes through foreachBatch (the same writer shape
  * the engine's merge sink uses).
  */
object CheckpointResumeSpec {
  val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
}

class CheckpointResumeSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps._
  import CheckpointResumeSpec.emitted

  private def start(mem: MemoryStream[KeyedEvent], ckpt: String) =
    latestWinsStream(mem.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[KeyedState], _: Long) =>
        batch.collect().foreach(s => emitted.add((s.key, s.seq, s.payload)))
        ()
      }
      .start()

  test("latestWinsStream state survives a query restart") {
    implicit val sq = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[KeyedEvent]

    val q1 = start(mem, ckpt)
    mem.addData(KeyedEvent("a", 1, "upsert", "v1"),
                KeyedEvent("b", 2, "upsert", "w1"))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: the second batch must see recovered
    // state (seq ordering holds across the restart boundary)
    val q2 = start(mem, ckpt)
    mem.addData(KeyedEvent("a", 0, "upsert", "stale"),   // older than state -> ignored
                KeyedEvent("b", 3, "delete", null),
                KeyedEvent("c", 4, "upsert", "x1"))
    q2.processAllAvailable()
    q2.stop()

    val latest = emitted.toArray(Array.empty[(String, Long, String)])
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
    // "a" re-emits its recovered state (v1 at seq 1, not "stale");
    // "b"'s delete removes it (last emit stays the pre-delete w1 at seq 2,
    // but no emit carries the delete) and "c" is new
    assert(latest("a")._3 == "v1", s"got $latest")
    assert(latest("c")._3 == "x1")
    assert(latest("b")._2 == 2L)   // nothing after the recovered seq-2 upsert
  }
}
