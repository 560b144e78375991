package graft.connector

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQueryException

/** The catalog's streaming face: `readStream.table` tails the manifest log
  * (offset = version), emitting the current snapshot first and then exactly
  * the appended dirs per batch; non-append changes fail loudly.
  */
class ChangeStreamSpec extends LakeSpec {
  protected def catalogName = "flake"

  test("snapshot as the first batch, appends after, no duplicates") {
    sql("CREATE TABLE flake.cf (k BIGINT, v STRING)")
    sql("INSERT INTO flake.cf VALUES (1, 'a')")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table("flake.cf").writeStream
      .option("checkpointLocation", tmp("cf-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    q.processAllAvailable()
    assert(got.toArray.toSeq === Seq(1L), "first batch = the current snapshot")
    sql("INSERT INTO flake.cf VALUES (2, 'b')")
    sql("INSERT INTO flake.cf VALUES (3, 'c')")
    q.processAllAvailable()
    q.stop()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(1L, 2L, 3L),
      "each append emitted exactly once")
  }

  test("fresh stream on a table with rewrite history and deletion vectors") {
    sql("CREATE TABLE flake.fv (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('graft.delete.mode'='merge-on-read')")
    sql("INSERT INTO flake.fv SELECT id, 'a' FROM range(0, 20)")
    sql("UPDATE flake.fv SET v = 'b' WHERE k < 5")      // rewrite in history
    sql("DELETE FROM flake.fv WHERE k >= 15")           // vector on the live snapshot
    assert(log("fv").currentEntries().exists(_.dv.isDefined))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table("flake.fv").writeStream
      .option("checkpointLocation", tmp("fv-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        b.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
      }
      .start()
    q.processAllAvailable()
    // base image = the LIVE rows: history rewrites irrelevant, vectors applied
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === (0L until 15L))
    // appends keep streaming after the vectored base image
    sql("INSERT INTO flake.fv VALUES (100, 'x')")
    q.processAllAvailable()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === ((0L until 15L) :+ 100L))
    // but a DELETE mid-stream still violates the append-only contract
    sql("DELETE FROM flake.fv WHERE k = 3")
    val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
    assert(ex.getCause.getMessage.contains("merge-on-read DELETE"))
    q.stop()
  }

  test("lineage columns are a batch feature: a stream selecting them fails") {
    sql("CREATE TABLE flake.lc (k BIGINT, v STRING)")
    sql("INSERT INTO flake.lc SELECT id, 'a' FROM range(0, 5)")
    // Spark's streaming planner never prunes DSv2 scans, so the connector
    // cannot learn that lineage columns were projected and cannot serve
    // them (the scan would emit data-schema rows under a wider plan).
    // Pin that the query fails rather than returning garbage; batch reads
    // of the same columns work (MorDeleteSpec).
    val q = spark.readStream.table("flake.lc")
      .select("k", "__graft_pos", "__graft_file")
      .writeStream
      .option("checkpointLocation", tmp("lc-ckpt"))
      .format("noop")
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
  }

  test("restart from checkpoint resumes at the last committed version") {
    sql("CREATE TABLE flake.cr (k BIGINT)")
    sql("INSERT INTO flake.cr VALUES (1)")
    val ckpt = tmp("cr-ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val q = spark.readStream.table("flake.cr").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.select("k").collect().foreach(r => got.add(r.getLong(0))); ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(got.toArray.map(_.asInstanceOf[Long]).toSeq === Seq(1L))
    sql("INSERT INTO flake.cr VALUES (2)")
    run()
    assert(got.toArray.map(_.asInstanceOf[Long]).sorted.toSeq === Seq(1L, 2L),
      "second run emits ONLY the rows appended since the checkpointed version")
  }

  test("aggregate pushdown survives the streaming-capable scan builder") {
    sql("CREATE TABLE flake.ag (k BIGINT, v STRING)")
    sql("INSERT INTO flake.ag SELECT id, concat('v', id) FROM range(0, 100)")
    val q = sql("SELECT min(k), max(k), count(*) FROM flake.ag")
    assert(q.collect().toSeq === Seq(org.apache.spark.sql.Row(0L, 99L, 100L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"),
      s"expected aggregate pushdown through GraftDelegatingScanBuilder in:\n$plan")
  }

  test("a time-travel-pinned table refuses to stream") {
    sql("CREATE TABLE flake.tt (k BIGINT)")
    sql("INSERT INTO flake.tt VALUES (1)")
    sql("INSERT INTO flake.tt VALUES (2)")
    val e = intercept[Exception] {
      spark.readStream.table("flake.tt VERSION AS OF 1")
    }
    // Spark may reject the syntax or our scan may refuse; either way the
    // pinned handle must not silently stream the live manifest. Drive the
    // scan directly to pin OUR refusal too:
    val cat = new GraftCatalog
    cat.initialize("flake", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", root)))
    val pinned = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "tt"), "1")
    val scan = pinned.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()).build()
    val refusal = intercept[UnsupportedOperationException] {
      scan.toMicroBatchStream("/tmp/unused")
    }
    assert(refusal.getMessage.contains("pinned"))
    assert(e != null)
  }

  test("a dir born AND removed inside one offset range still fails loudly") {
    sql("CREATE TABLE flake.ir (k BIGINT, v STRING)")
    sql("INSERT INTO flake.ir VALUES (1, 'a')")
    val q = spark.readStream.table("flake.ir").writeStream
      .option("checkpointLocation", tmp("ir-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) => b.count(); () }
      .start()
    q.processAllAvailable()
    // two commits BEFORE the next batch plans: the new dir of v+1 is
    // removed again at v+2, so it is invisible to an endpoint-only diff —
    // its rows would silently never reach the stream
    sql("INSERT INTO flake.ir VALUES (100, 'tmp'), (101, 'tmp')")
    sql("DELETE FROM flake.ir WHERE k >= 100")
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("non-append"), s"expected the append-only refusal, got: $msgs")
    q.stop()
  }

  test("a rewrite between stream batches fails loudly, not as phantom appends") {
    sql("CREATE TABLE flake.rw (k BIGINT, v STRING)")
    sql("INSERT INTO flake.rw VALUES (1, 'a'), (2, 'b')")
    val q = spark.readStream.table("flake.rw").writeStream
      .option("checkpointLocation", tmp("rw-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) => b.count(); () }
      .start()
    q.processAllAvailable()
    sql("UPDATE flake.rw SET v = 'X' WHERE k = 1")   // rewrites the dir
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("non-append"), s"expected the append-only refusal, got: $msgs")
    q.stop()
  }
}
