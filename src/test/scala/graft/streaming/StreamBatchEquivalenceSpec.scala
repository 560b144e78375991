package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.engine.{ContractReplay, ScEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

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
}
