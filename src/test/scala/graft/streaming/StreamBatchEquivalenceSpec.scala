package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.engine.{ContractReplay, ScEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Top-level so the product encoder codegen can find the constructor. */
case class Ev(ts: Timestamp, kind: String)

/** Cross-layer check: streaming the sidechain vote events through the
  * flatMapGroupsWithState fold must land on the same vote_rshares as the
  * batch ContractReplay closed form over the identical event list.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps._

  private def t(s: String) = Timestamp.valueOf(s)
  private def d(v: String) = new java.math.BigDecimal(v)

  private val events = Seq(
    ScEvent(10, t("2024-01-01 00:00:09"), action = "comment", event = "newComment",
      symbol = "PAL", author = "alice", permlink = "p"),
    ScEvent(30, t("2024-01-01 01:00:00"), action = "vote", event = "newVote",
      symbol = "PAL", author = "alice", permlink = "p", voter = "bob",
      weight = Some(10000), rshares = d("1000")),
    ScEvent(40, t("2024-01-01 02:00:00"), action = "vote", event = "updateVote",
      symbol = "PAL", author = "alice", permlink = "p", voter = "bob",
      weight = Some(5000), rshares = d("400")),
    ScEvent(50, t("2024-01-02 00:00:00"), action = "comment", event = "authorReward",
      symbol = "PAL", authorperm = "@alice/p", account = "alice", quantity = d("3")),
    ScEvent(60, t("2024-01-03 00:00:00"), action = "vote", event = "newVote",
      symbol = "PAL", author = "alice", permlink = "p", voter = "carol",
      weight = Some(10000), rshares = d("700")),
    ScEvent(70, t("2024-01-04 00:00:00"), action = "vote", event = "updateVote",
      symbol = "PAL", author = "alice", permlink = "p", voter = "bob",
      weight = Some(10000), rshares = d("900")))

  test("stream vote fold == batch ContractReplay closed form") {
    // batch side: the full postsState derivation
    val ev = events.toDF()
      .withColumn("rshares", col("rshares").cast(graft.engine.Schemas.decimal))
      .withColumn("quantity", col("quantity").cast(graft.engine.Schemas.decimal))
    val cfg = Seq(("PAL", 7)).toDF("token", "cashout_window_days")
    val batch = ContractReplay.postsState(ev, cfg,
      deletes = Seq.empty[(Long, String)].toDF("seq", "authorperm"),
      transfers = Seq.empty[(Long, String, String, java.math.BigDecimal)]
        .toDF("seq", "token", "authorperm", "amount"))
      .select("vote_rshares").collect().head.getDecimal(0)

    // stream side: the same events as VoteEvents through keyed state
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[VoteEvent]
    val q = voteFoldStream(mem.toDS())
      .writeStream.format("memory").queryName("sbe")
      .outputMode("update").start()
    // persisted reference semantics: authorReward never resets the stored
    // vote_rshares (its zeroing is a dict-only dead store), so the stream
    // fold sees only the vote events
    val voteEvents = events.filter(e =>
        e.event == "newVote" || e.event == "updateVote")
      .map(e => VoteEvent("@alice/p", "PAL",
        Option(e.voter).getOrElse(""), e.seq, e.ts,
        Option(e.rshares).map(_.doubleValue).getOrElse(0.0),
        reset = false))
    // deliver in two micro-batches split at the payout boundary
    val (first, second) = voteEvents.partition(_.seq < 50)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sbe").orderBy(col("lastTs").desc).collect().head
      .getAs[Double]("totalRshares")

    // persisted fold: bob 1000 -> 400 -> 900 (latest 900), carol 700
    assert(batch.doubleValue == 1600.0, s"batch=$batch")
    assert(streamed == 1600.0, s"streamed=$streamed")
  }

  test("watermarked tumbling windows: append-mode stream == batch windowing") {
    val evs = Seq(
      Ev(t("2024-01-01 00:05:00"), "click"), Ev(t("2024-01-01 00:40:00"), "click"),
      Ev(t("2024-01-01 00:55:00"), "view"),  Ev(t("2024-01-01 01:10:00"), "click"),
      Ev(t("2024-01-01 02:20:00"), "view"),  Ev(t("2024-01-01 02:30:00"), "view"))
    // sentinel far in the future: pushes the watermark past every real
    // window's end so append mode emits them all deterministically
    val sentinel = Ev(t("2024-01-02 12:00:00"), "sentinel")

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.windowedCounts(mem.toDF(), "ts", "kind",
        windowDur = "1 hour", watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("twc")
      .outputMode("append").start()
    val (h1, h2) = evs.splitAt(3)
    mem.addData(h1: _*); q.processAllAvailable()
    mem.addData(h2: _*); q.processAllAvailable()
    mem.addData(sentinel); q.processAllAvailable()
    // one more empty pass so the watermark advanced by the sentinel batch
    // flushes the last real windows
    mem.addData(); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("twc")
      .filter(col("kind") =!= "sentinel")
      .select("window_start", "kind", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = StreamOps.windowedCounts(
        evs.toDF("ts", "kind"), "ts", "kind", "1 hour", "30 minutes")
      .select("window_start", "kind", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch == Set(
      (t("2024-01-01 00:00:00"), "click", 2L), (t("2024-01-01 00:00:00"), "view", 1L),
      (t("2024-01-01 01:00:00"), "click", 1L), (t("2024-01-01 02:00:00"), "view", 2L)))
  }
}
