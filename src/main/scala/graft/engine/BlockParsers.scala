package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw sidechain block → flattened event envelope (Schemas.scEvents /
  * Schemas.transfers).
  *
  * Input shape mirrors the RPC block payload the reference polls
  * (`stream_engine_sidechain_blocks.py:44-98`, FIXTURES.md §B3):
  *
  *   blockNumber long, timestamp string,
  *   transactions array<struct<contract, action, sender, transactionId,
  *                             payload: string(JSON), logs: string(JSON)>>
  *
  * logs JSON: {"errors": [...]?, "events": [{"contract","event","data":{..}}]?}
  *
  * seq comes from `Schemas.sidechainSeq(ts, blockSlot, txIdx, evIdx)` —
  * the timestamp-major cross-stream order that compares correctly against
  * L1 seqs (see the encoder scaladoc in Schemas; the same-second block
  * slot is computed exactly from block headers by `withBlockSlots`).
  */
object BlockParsers {

  private val logsSchema = StructType(Seq(
    StructField("errors", ArrayType(StringType)),
    StructField("events", ArrayType(StructType(Seq(
      StructField("contract", StringType),
      StructField("event", StringType),
      StructField("data", MapType(StringType, StringType))))))))

  private def pj(field: String): Column = get_json_object(col("payload"), s"$$.$field")

  /** Exact same-second block slots for `Schemas.sidechainSeq`: blocks
    * sharing a timestamp rank in blockNumber order (0 = first/only block of
    * its second). Computed on BLOCK HEADERS only — the window shuffles
    * (blockNumber, ts) pairs, never transaction payloads — and only the
    * anomalous rows (slot > 0, i.e. chain hiccups; empty at the 3 s
    * cadence) join back, as a broadcast. An absolute blockNum mod 4 would
    * invert same-second blocks crossing a mod-4 boundary (7, 8 → 3, 0).
    */
  private def withBlockSlots(blocks: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__slot_ts")).orderBy(col("__slot_bn"))
    val anomalous = blocks
      .select(col("blockNumber").as("__slot_bn"),
        to_timestamp(col("timestamp")).as("__slot_ts"))
      .withColumn("block_slot", row_number().over(w) - 1)
      .filter(col("block_slot") > 0)
      .drop("__slot_ts")
    blocks.join(broadcast(anomalous),
        col("blockNumber") === col("__slot_bn"), "left")
      .withColumn("block_slot", coalesce(col("block_slot"), lit(0)))
      .drop("__slot_bn")
  }

  private def txs(blocks: DataFrame): DataFrame =
    withBlockSlots(blocks).select(col("blockNumber"), col("block_slot"),
        to_timestamp(col("timestamp")).as("ts"),
        posexplode(col("transactions")).as(Seq("tx_idx", "tx")))
      .select(col("blockNumber"), col("block_slot"), col("ts"), col("tx_idx"),
        col("tx.contract").as("contract"), col("tx.action").as("action"),
        col("tx.sender").as("sender"), col("tx.transactionId").as("txid"),
        col("tx.payload").as("payload"),
        from_json(col("tx.logs"), logsSchema).as("logs"))
      .withColumn("has_errors",
        col("logs.errors").isNotNull && size(col("logs.errors")) > 0 &&
          // check_engine_op ignores "contract doesn't exist"
          !(col("logs.errors") === array(lit("contract doesn't exist"))))

  /** comments-contract stream → Schemas.scEvents rows. Emits one row per
    * logs.events[] entry plus one row per setMute/setPostMute action (those
    * carry no events — the payload is the event).
    */
  def sidechainEvents(blocks: DataFrame): DataFrame = {
    val t = txs(blocks).filter(col("contract") === "comments" && !col("has_errors"))

    val fromEvents = t
      .select(col("*"), posexplode(col("logs.events")).as(Seq("ev_idx", "ev")))
      .filter(col("ev.contract") === "comments")
      .select(
        Schemas.sidechainSeq(col("ts"), col("block_slot"),
          col("tx_idx"), col("ev_idx")).as("seq"),
        col("ts"), col("txid"), col("sender"), col("action"),
        col("ev.event").as("event"),
        coalesce(col("ev.data")("symbol"), pj("symbol")).as("symbol"),
        pj("author").as("author"), pj("permlink").as("permlink"),
        col("ev.data")("authorperm").as("authorperm"),
        pj("voter").as("voter"),
        expr("try_cast(get_json_object(payload, '$.weight') AS SMALLINT)").as("weight"),
        col("ev.data")("rshares").cast(Schemas.decimal).as("rshares"),
        col("ev.data")("account").as("account"),
        col("ev.data")("quantity").cast(Schemas.decimal).as("quantity"),
        lit(null).cast("boolean").as("mute"),
        configMap(col("ev.data")).as("config"))

    val fromMutes = t
      .filter(col("action").isin("setMute", "setPostMute"))
      .select(
        Schemas.sidechainSeq(col("ts"), col("block_slot"),
          col("tx_idx"), lit(0L)).as("seq"),
        col("ts"), col("txid"), col("sender"), col("action"),
        lit(null).cast("string").as("event"),
        lit(null).cast("string").as("symbol"),   // resolved from rewardPoolId below
        lit(null).cast("string").as("author"), lit(null).cast("string").as("permlink"),
        pj("authorperm").as("authorperm"),
        lit(null).cast("string").as("voter"),
        lit(null).cast("smallint").as("weight"),
        lit(null).cast(Schemas.decimal).as("rshares"),
        pj("account").as("account"),
        lit(null).cast(Schemas.decimal).as("quantity"),
        expr("try_cast(get_json_object(payload, '$.mute') AS BOOLEAN)").as("mute"),
        lit(null).cast(MapType(StringType, StringType)).as("config"),
        expr("try_cast(get_json_object(payload, '$.rewardPoolId') AS INT)")
          .as("reward_pool_id"))

    (fromEvents.withColumn("reward_pool_id", lit(null).cast("int")))
      .unionByName(fromMutes)
  }

  /** Mute rows carry rewardPoolId, not a symbol; resolve against config
    * (reference: token_config_by_id, engine_comments_contract_processor.py:34-49).
    */
  def resolveMuteSymbols(events: DataFrame, tokenConfig: DataFrame): DataFrame = {
    val byId = tokenConfig.select(col("reward_pool_id").as("rp_id"),
      col("token").as("rp_token"))
    events.join(broadcast(byId), col("reward_pool_id") === col("rp_id"), "left")
      .withColumn("symbol", coalesce(col("symbol"), col("rp_token")))
      .drop("rp_id", "rp_token", "reward_pool_id")
  }

  /** tokens.transfer ops → Schemas.transfers (promotion candidates,
    * stream_engine_sidechain_blocks.py:60-87).
    */
  def sidechainTransfers(blocks: DataFrame): DataFrame =
    txs(blocks)
      .filter(col("contract") === "tokens" && col("action") === "transfer")
      .select(
        Schemas.sidechainSeq(col("ts"), col("block_slot"),
          col("tx_idx"), lit(0L)).as("seq"),
        col("ts"), col("txid"), col("sender"),
        pj("symbol").as("symbol"), pj("quantity").as("quantity"),
        pj("memo").as("memo"), pj("to").as("to"),
        col("has_errors"))

  /** createRewardPool/updateRewardPool carry their config in the payload —
    * project the fields ContractReplay consumes into the data map.
    */
  private def configMap(data: Column): Column = {
    val fields = Seq(
      "postRewardCurveParameter", "curationRewardCurveParameter",
      "curationRewardPercentage", "cashoutWindowDays", "voteRegenerationDays",
      "downvoteRegenerationDays", "stakedRewardPercentage",
      "votePowerConsumption", "downvotePowerConsumption",
      "disableDownvote", "ignoreDeclinePayout")
    val pairs = fields.flatMap(f =>
      Seq(lit(f), get_json_object(col("payload"), s"$$.config.$f"))) ++
      // tags is a JSON array -> CSV (the reference joins with commas). An
      // ABSENT config.tags must stay null — like every other field here —
      // so the sparse-upsert compaction keeps the prior value; only an
      // explicit tags:[] becomes the (present) empty string
      Seq(lit("tags"),
        when(get_json_object(col("payload"), "$.config.tags").isNull,
          lit(null).cast(StringType))
        .otherwise(array_join(coalesce(from_json(
          get_json_object(col("payload"), "$.config.tags"),
          ArrayType(StringType)), array().cast(ArrayType(StringType))), ","))) ++
      // createRewardPool events carry the new pool's id in data._id
      // (engine_comments_contract_processor.py:219-224)
      Seq(lit("_id"), data("_id"))
    map(pairs: _*)
  }
}
