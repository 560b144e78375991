package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class RawTx(contract: String, action: String, sender: String,
                 transactionId: String, payload: String, logs: String)
case class RawBlock(blockNumber: Long, timestamp: String,
                    transactions: Seq[RawTx])

/** Raw nested block JSON → flattened events, end to end (FIXTURES.md §B3). */
class BlockParsersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val blocks = Seq(
    RawBlock(100, "2024-01-01T00:00:00", Seq(
      RawTx("comments", "comment", "alice", "tx-a",
        """{"author":"alice","permlink":"p1"}""",
        """{"events":[{"contract":"comments","event":"newComment","data":{"symbol":"PAL"}}]}"""),
      RawTx("comments", "vote", "bob", "tx-b",
        """{"author":"alice","permlink":"p1","voter":"bob","weight":10000}""",
        """{"events":[{"contract":"comments","event":"newVote","data":{"symbol":"PAL","rshares":"1234"}}]}"""))),
    RawBlock(101, "2024-01-01T00:00:03", Seq(
      RawTx("comments", "setMute", "issuer", "tx-c",
        """{"rewardPoolId":1,"account":"mallory","mute":true}""",
        """{}"""),
      RawTx("tokens", "transfer", "fan", "tx-d",
        """{"symbol":"PAL","quantity":"2.5","memo":"@alice/p1","to":"null"}""",
        """{}"""),
      RawTx("tokens", "transfer", "fan", "tx-e",
        """{"symbol":"PAL","quantity":"9.9","memo":"@alice/p1","to":"null"}""",
        """{"errors":["insufficient balance"]}"""),
      RawTx("comments", "createRewardPool", "issuer", "tx-f",
        """{"symbol":"PAL","config":{"cashoutWindowDays":7,"curationRewardPercentage":50,"postRewardCurveParameter":"1.0","curationRewardCurveParameter":"0.5","tags":["pal","hive"]}}""",
        """{"events":[{"contract":"comments","event":"createRewardPool","data":{"_id":"1"}}]}"""))))
    .toDF()

  private lazy val events = BlockParsers.sidechainEvents(blocks)

  test("events flattened with stable seq and payload extraction") {
    val nc = events.filter(col("event") === "newComment").collect().head
    assert(nc.getAs[String]("symbol") == "PAL")
    assert(nc.getAs[String]("author") == "alice")

    val nv = events.filter(col("event") === "newVote").collect().head
    assert(nv.getAs[java.math.BigDecimal]("rshares").longValue() == 1234L)
    assert(nv.getAs[Short]("weight") == 10000)

    // seq is the cross-stream total order: within a block later txs sort
    // later, across blocks later timestamps sort later
    assert(nc.getAs[Long]("seq") < nv.getAs[Long]("seq"))
    val mute = events.filter(col("action") === "setMute").collect().head
    assert(nv.getAs[Long]("seq") < mute.getAs[Long]("seq"))
  }

  test("cross-stream order: same-second L1 ops sort after sidechain events, later seconds after both") {
    // the reference's alignment gate releases an L1 op at ts T only once the
    // sidechain has streamed past T (stream_blocks.py:85-91): sidechain
    // first on timestamp ties, timestamp-major everywhere else
    val probe = Seq(("2024-01-01T00:00:00", "2024-01-01T00:00:03"))
      .toDF("t0", "t1")
      .select(
        Schemas.sidechainSeq(to_timestamp(col("t0")), lit(0L), lit(5L), lit(2L)).as("sc_t0"),
        Schemas.l1Seq(to_timestamp(col("t0")), lit(0L), lit(0L)).as("l1_t0"),
        Schemas.sidechainSeq(to_timestamp(col("t1")), lit(0L), lit(0L), lit(0L)).as("sc_t1"),
        Schemas.l1Seq(to_timestamp(col("t1")), lit(0L), lit(7L)).as("l1_t1"))
      .collect().head
    val (scT0, l1T0, scT1, l1T1) =
      (probe.getLong(0), probe.getLong(1), probe.getLong(2), probe.getLong(3))
    assert(scT0 < l1T0, "sidechain wins the same-second tie")
    assert(l1T0 < scT1 && scT1 < l1T1, "timestamp-major across streams")
    // an L1 delete in the same second as a sidechain create kills it
    // (the gate guarantees the create was processed first)
    assert(Seq(scT0, l1T0, scT1, l1T1) == Seq(scT0, l1T0, scT1, l1T1).sorted)
  }

  test("same-second blocks crossing a mod-4 boundary keep blockNumber order") {
    // blocks 7 and 8 share a timestamp: 7 % 4 = 3 > 8 % 4 = 0, so an
    // absolute-mod slot would invert their seqs. The header-ranked slot
    // (7 -> 0, 8 -> 1) must keep the chain order.
    val hiccup = Seq(
      RawBlock(7, "2024-01-01T00:00:09", Seq(
        RawTx("comments", "comment", "alice", "tx-h1",
          """{"author":"alice","permlink":"h1"}""",
          """{"events":[{"contract":"comments","event":"newComment","data":{"symbol":"PAL"}}]}"""))),
      RawBlock(8, "2024-01-01T00:00:09", Seq(
        RawTx("comments", "comment", "alice", "tx-h2",
          """{"author":"alice","permlink":"h2"}""",
          """{"events":[{"contract":"comments","event":"newComment","data":{"symbol":"PAL"}}]}"""))))
      .toDF()
    val seqs = BlockParsers.sidechainEvents(hiccup)
      .orderBy("seq").select("txid").as[String].collect().toSeq
    assert(seqs == Seq("tx-h1", "tx-h2"),
      "block 7's tx must sort before block 8's despite the mod-4 wrap")
  }

  test("index overflow fails loudly instead of corrupting higher seq fields") {
    val bad = Seq(("2024-01-01T00:00:00")).toDF("t")
      .select(Schemas.sidechainSeq(to_timestamp(col("t")), lit(0L), lit(2048L), lit(0L)))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("out of range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of range")))
  }

  test("setMute resolved from rewardPoolId via token config") {
    val cfg = Seq(("PAL", 1)).toDF("token", "reward_pool_id")
    val resolved = BlockParsers.resolveMuteSymbols(events, cfg)
    val m = resolved.filter(col("action") === "setMute").collect().head
    assert(m.getAs[String]("symbol") == "PAL")
    assert(m.getAs[String]("account") == "mallory")
    assert(m.getAs[Boolean]("mute"))
  }

  test("transfers parsed; contract errors flagged (check_engine_op)") {
    val t = BlockParsers.sidechainTransfers(blocks)
      .orderBy("seq").collect()
    assert(t.length == 2)
    assert(!t(0).getAs[Boolean]("has_errors") && t(0).getAs[String]("quantity") == "2.5")
    assert(t(1).getAs[Boolean]("has_errors"))
  }

  test("reward-pool config projected into the data map (tags CSV-joined)") {
    val rp = events.filter(col("event") === "createRewardPool").collect().head
    val cfgMap = rp.getAs[Map[String, String]]("config")
    assert(cfgMap("cashoutWindowDays") == "7")
    assert(cfgMap("tags") == "pal,hive")
    assert(cfgMap("postRewardCurveParameter") == "1.0")
  }

  test("parsed events drive ContractReplay end to end") {
    val votes = ContractReplay.votesState(events)
    val v = votes.collect().head
    assert(v.getAs[String]("authorperm") == "@alice/p1")
    assert(v.getAs[java.math.BigDecimal]("rshares").longValue() == 1234L)
  }
}
