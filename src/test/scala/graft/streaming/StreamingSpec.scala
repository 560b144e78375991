package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.core.Upsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming/batch equivalence (SURVEY.md §5.4): the flatMapGroupsWithState
  * folds produce the same end state as the batch window forms on identical
  * event logs, micro-batch by micro-batch.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps._

  private def t(s: String) = Timestamp.valueOf(s)

  test("latestWinsStream: a late cross-batch upsert cannot resurrect a deleted key") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = latestWinsStream(mem.toDS())
      .writeStream.format("memory").queryName("lw_tomb")
      .outputMode("update").start()
    mem.addData(KeyedEvent("k", 1, "upsert", "v1"), KeyedEvent("k", 5, "delete", null))
    q.processAllAvailable()
    // LATE out-of-order upsert in a later micro-batch, older than the delete:
    // the tombstone's seq must fence it (same events in ONE batch leave k dead)
    mem.addData(KeyedEvent("k", 3, "upsert", "zombie"))
    q.processAllAvailable()
    // a genuinely newer upsert revives the key
    mem.addData(KeyedEvent("k", 7, "upsert", "reborn"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lw_tomb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    assert(!rows.exists(_._3 == "zombie"), s"resurrected: $rows")
    assert(rows.contains(("k", 7L, "reborn")))
  }

  test("latestWinsStream end state == batch latestWins") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = latestWinsStream(mem.toDS())
      .writeStream.format("memory").queryName("lw")
      .outputMode("update").start()

    mem.addData(
      KeyedEvent("a", 1, "upsert", "v1"),
      KeyedEvent("b", 2, "upsert", "w1"))
    q.processAllAvailable()
    mem.addData(
      KeyedEvent("a", 3, "upsert", "v2"),
      KeyedEvent("b", 4, "delete", null),
      KeyedEvent("c", 6, "upsert", "x2"),  // out-of-order within batch
      KeyedEvent("c", 5, "upsert", "x1"))
    q.processAllAvailable()
    q.stop()

    // latest update per key from the memory sink = stream end state
    val streamed = spark.table("lw")
      .groupBy("key").agg(max(struct(col("seq"), col("payload"))).as("s"))
      .select(col("key"), col("s.payload"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

    val batchLog = Seq(
      ("a", 1L, "upsert", "v1"), ("b", 2L, "upsert", "w1"),
      ("a", 3L, "upsert", "v2"), ("b", 4L, "delete", null),
      ("c", 6L, "upsert", "x2"), ("c", 5L, "upsert", "x1"))
      .toDF("key", "seq", "op", "payload")
    val batch = Upsert.compactLog(batchLog, Seq("key"), "seq", "op")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

    assert(batch == Map("a" -> "v2", "c" -> "x2"))
    assert(streamed("a") == "v2" && streamed("c") == "x2")
    assert(!batch.contains("b"))      // deleted in batch state
  }

  test("voteFoldStream: update replaces; payout evicts the post's keyed state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[VoteEvent]
    val q = voteFoldStream(mem.toDS())
      .writeStream.format("memory").queryName("vf")
      .outputMode("update").start()

    mem.addData(
      VoteEvent("@a/p", "PAL", "bob", 1, t("2024-01-01 01:00:00"), 1000, reset = false),
      VoteEvent("@a/p", "PAL", "bob", 2, t("2024-01-01 02:00:00"), 500, reset = false),
      VoteEvent("@a/p", "PAL", "carol", 3, t("2024-01-01 03:00:00"), 2000, reset = false))
    q.processAllAvailable()
    // payout alone publishes nothing (persisted total is never zeroed — the
    // reference's zeroing is a dict-only dead store) and drops keyed state
    mem.addData(
      VoteEvent("@a/p", "PAL", null, 4, t("2024-01-08 00:00:00"), 0, reset = true))
    q.processAllAvailable()
    val afterPayout = spark.table("vf").orderBy(col("lastTs").desc_nulls_last)
      .collect().head
    assert(afterPayout.getAs[Double]("totalRshares") == 2500.0)  // 500 + 2000
    // a (chain-impossible) late vote rebuilds from an empty voter map —
    // proof the payout really evicted the state
    mem.addData(
      VoteEvent("@a/p", "PAL", "bob", 5, t("2024-01-09 00:00:00"), 800, reset = false))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("vf").orderBy(col("lastTs").desc_nulls_last)
      .collect().head
    assert(last.getAs[Double]("totalRshares") == 800.0)
  }

  test("voteFoldStream: vote and payout in ONE micro-batch still publishes the vote") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[VoteEvent]
    val q = voteFoldStream(mem.toDS())
      .writeStream.format("memory").queryName("vf_same_batch")
      .outputMode("update").start()
    // a micro-batch spanning many blocks: two votes then the payout, all in
    // one trigger. Batch ContractReplay's total for this post is 1000+2000;
    // the stream sink's last row must agree even though the payout evicts
    // the keyed state in the same invocation.
    mem.addData(
      VoteEvent("@a/q", "PAL", "bob", 1, t("2024-01-01 01:00:00"), 1000, reset = false),
      VoteEvent("@a/q", "PAL", "carol", 2, t("2024-01-01 02:00:00"), 2000, reset = false),
      VoteEvent("@a/q", "PAL", null, 3, t("2024-01-08 00:00:00"), 0, reset = true))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("vf_same_batch").collect()
    assert(rows.nonEmpty, "the same-batch vote contribution was never emitted")
    val last = rows.maxBy(_.getAs[Timestamp]("lastTs").getTime)
    assert(last.getAs[Double]("totalRshares") == 3000.0, s"got $last")
  }

  test("alignment gate: a lagging writer cannot regress the persisted watermark") {
    val cfgDir = java.nio.file.Files.createTempDirectory("graft-gate-regress").toString
    new AlignmentGate(Some(cfgDir)).advance(6000)
    // a second process whose in-memory cell is behind publishes a smaller
    // value; the durable watermark must stay at the max
    new AlignmentGate(Some(cfgDir)).advance(1000)
    assert(new AlignmentGate(Some(cfgDir)).current == 6000L)
  }

  test("alignment gate: concurrent publishers never crash and never tear the file") {
    // racing advance() calls each write through a unique tmp name: no
    // shared-tmp collision (HDFS lease crash / local torn write), and the
    // durable file always parses to SOME published value. The max-fold is
    // best-effort under races (documented: true CAS needs coordination),
    // so the assertion is membership + parseability, not the exact max.
    val cfgDir = java.nio.file.Files.createTempDirectory("graft-gate-conc").toString
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        val g = new AlignmentGate(Some(cfgDir))
        (1 to 20).foreach(j => g.advance(i * 1000L + j))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val v = new AlignmentGate(Some(cfgDir)).current
    assert(v >= 1001L && v <= 8020L, s"torn or unparseable watermark: $v")
  }

  test("alignment gate holds L1 ops until the sidechain passes them (T2)") {
    implicit val sq = spark.sqlContext
    val gate = new AlignmentGate
    val mem = MemoryStream[GatedOp]
    // driven by arrivals (each batch re-evaluates the buffer); production
    // uses the processing-time timeout for idle-release
    val q = alignedStream(mem.toDS(), gate, timeoutMs = 0)
      .writeStream.format("memory").queryName("gated")
      .outputMode("append").start()

    gate.advance(1500)                      // sidechain has reached t=1.5s
    mem.addData(
      GatedOp("k", 1, 1000, "early"),
      GatedOp("k", 2, 5000, "late"))
    q.processAllAvailable()
    val afterFirst = spark.table("gated").collect().map(_.getString(3)).toSet
    assert(afterFirst == Set("early"), s"got $afterFirst")

    gate.advance(6000)                      // sidechain passes the late op
    mem.addData(GatedOp("k", 3, 1200, "next"))  // next arrival flushes buffer
    q.processAllAvailable()
    val afterSecond = spark.table("gated").collect().map(_.getString(3)).toSet
    q.stop()
    assert(afterSecond == Set("early", "late", "next"), s"got $afterSecond")
  }

  test("alignment gate survives a query restart via the configuration table") {
    implicit val sq = spark.sqlContext
    val cfgDir = java.nio.file.Files.createTempDirectory("graft-gate").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gate-ckpt").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val mem = MemoryStream[GatedOp]
    def start(gate: AlignmentGate) =
      alignedStream(mem.toDS(), gate, timeoutMs = 0)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[GatedOp], _: Long) =>
          b.collect().foreach(o => emitted.add(o.payload)); ()
        }.start()

    // first incarnation: sidechain at t=1.5s, the late op stays buffered
    val g1 = new AlignmentGate(Some(cfgDir))
    g1.advance(1500)
    val q1 = start(g1)
    mem.addData(GatedOp("k", 1, 1000, "early"), GatedOp("k", 2, 5000, "late"))
    q1.processAllAvailable()
    q1.stop()
    assert(emitted.toArray.toSet == Set("early"))

    // the sidechain query advances the persisted watermark, then everything
    // restarts: a FRESH gate instance must resume at the persisted progress,
    // and the restarted query must release the op buffered before the restart
    new AlignmentGate(Some(cfgDir)).advance(6000)
    val g2 = new AlignmentGate(Some(cfgDir))
    assert(g2.current == 6000L)
    val q2 = start(g2)
    mem.addData(GatedOp("k", 3, 1200, "next"))   // arrival triggers re-evaluation
    q2.processAllAvailable()
    q2.stop()
    assert(emitted.toArray.toSet == Set("early", "late", "next"),
      s"got ${emitted.toArray.toSet}")
  }

  test("streaming ingest dedup: first fingerprint occurrence passes, repeats drop across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[IngestDoc]
    val q = dedupStream(mem.toDS())
      .writeStream.format("memory").queryName("ddup")
      .outputMode("append").start()
    mem.addData(
      IngestDoc(1, "fpA", t("2024-01-01 00:00:01")),
      IngestDoc(2, "fpA", t("2024-01-01 00:00:02")),   // same-batch dup
      IngestDoc(3, "fpB", t("2024-01-01 00:00:03")))
    q.processAllAvailable()
    mem.addData(
      IngestDoc(4, "fpA", t("2024-01-02 00:00:00")),   // cross-batch dup
      IngestDoc(5, "fpC", t("2024-01-02 00:00:01")))
    q.processAllAvailable()
    q.stop()
    val passed = spark.table("ddup").collect().map(_.getLong(0)).toSet
    assert(passed == Set(1L, 3L, 5L), s"got $passed")
  }

  test("freshness gate (T1): ops younger than 15s are filtered") {
    val now = 100000L
    val ops = Seq(("a", now - 20000), ("b", now - 10000), ("c", now - 16000))
      .toDF("k", "ts_ms")
    val gated = ops.filter(col("ts_ms") <= lit(now - 15000))
      .collect().map(_.getString(0)).toSet
    assert(gated == Set("a", "c"))
  }
}
