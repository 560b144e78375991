package graft.engine

import org.apache.spark.sql.types._

/** State-table and input-stream schemas mirroring the reference DDL
  * (`sql/engine.sql:3-162`; SURVEY.md §1.2-1.3, FIXTURES.md §B).
  *
  * Divergences by design: `tags` is ArrayType internally (the reference stores
  * CSV-in-varchar and splits at query time); rshares/quantities are
  * DecimalType(38,8) (the reference's PG `numeric` handled as Python Decimal);
  * scores stay FloatType like PG `real`.
  */
object Schemas {

  val decimal: DecimalType = DecimalType(38, 8)

  /** Cross-stream replay order. The reference runs L1 and sidechain
    * ingestion as two processes whose only coupling is the alignment gate:
    * an L1 op at timestamp T is held until the sidechain has streamed past
    * T (`stream_blocks.py:85-91`). The canonical batch-replay total order
    * is therefore TIMESTAMP-major with the sidechain lane winning ties —
    * and every `seq`, from either stream, must come from these encoders so
    * that cross-stream comparisons (L1 delete vs sidechain create,
    * tribe-settings as-of vs promotion transfer) compare meaningfully.
    * Encoding one stream as block·10⁶ and the other as block·10⁴ would
    * make every sidechain seq exceed every L1 seq at real block heights.
    *
    * Long layout (high → low): unix seconds ×2²⁴ | lane ×2²³ (0 sidechain,
    * 1 L1) | same-second block slot ×2²¹ | tx/op idx ×2¹⁰ | event idx.
    * Capacity: 4 same-second blocks per lane, 2048 txs (or L1 ops) per
    * block, 1024 events per tx — each ≥3 orders of magnitude above the
    * chains' actual rates (one block per ~3 s). Max epoch ~5×10¹¹ s before
    * long overflow.
    *
    * `blockSlot` is the block's rank AMONG BLOCKS SHARING ITS TIMESTAMP
    * (0 for the first / only block of a second), NOT blockNum mod 4 — an
    * absolute mod inverts order when same-second block numbers cross a
    * mod-4 boundary (blocks 7, 8 → slots 3, 0). `BlockParsers.txs`
    * computes exact slots from block headers; callers encoding a single
    * known-isolated block pass 0. Every index is bounds-checked and fails
    * loudly on overflow instead of silently corrupting higher fields.
    */
  private def bounded(c: org.apache.spark.sql.Column, limit: Long,
                      name: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(c < 0 || c >= limit,
      raise_error(concat(lit(s"$name out of range [0, $limit): "), c.cast("string"))))
      .otherwise(c.cast("long"))
  }

  private def packedSeq(ts: org.apache.spark.sql.Column, lane: Int,
                        blockSlot: org.apache.spark.sql.Column,
                        majorIdx: org.apache.spark.sql.Column,
                        minorIdx: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    unix_timestamp(ts) * (1L << 24) + lit(lane.toLong * (1L << 23)) +
      bounded(blockSlot, 4L, "blockSlot") * (1L << 21) +
      bounded(majorIdx, 2048L, "tx/op idx") * (1L << 10) +
      bounded(minorIdx, 1024L, "event idx")
  }

  def sidechainSeq(ts: org.apache.spark.sql.Column, blockSlot: org.apache.spark.sql.Column,
                   txIdx: org.apache.spark.sql.Column,
                   evIdx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    packedSeq(ts, 0, blockSlot, txIdx, evIdx)

  def l1Seq(ts: org.apache.spark.sql.Column, blockSlot: org.apache.spark.sql.Column,
            opIdx: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    packedSeq(ts, 1, blockSlot, opIdx, lit(0L))
  }

  /** Canonical authorperm key: "@author/permlink" (utils.construct_authorperm)
    * — the join key between every L1- and sidechain-derived table, so there
    * is exactly ONE construction rule.
    */
  def authorperm(author: org.apache.spark.sql.Column,
                 permlink: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat(lit("@"), author, lit("/"), permlink)
  }

  val posts: StructType = StructType(Seq(
    StructField("authorperm", StringType), StructField("token", StringType),
    StructField("author", StringType), StructField("created", TimestampType),
    StructField("tags", ArrayType(StringType)), StructField("app", StringType),
    StructField("main_post", BooleanType), StructField("decline_payout", BooleanType),
    StructField("vote_rshares", decimal), StructField("cashout_time", TimestampType),
    StructField("last_payout", TimestampType), StructField("total_payout_value", decimal),
    StructField("curator_payout_value", decimal), StructField("score_trend", FloatType),
    StructField("score_hot", FloatType), StructField("beneficiaries_payout_value", decimal),
    StructField("promoted", decimal), StructField("title", StringType),
    StructField("desc", StringType), StructField("children", IntegerType),
    StructField("parent_author", StringType), StructField("parent_permlink", StringType),
    StructField("score_promoted", FloatType), StructField("muted", BooleanType)))

  val postMetadata: StructType = StructType(Seq(
    StructField("authorperm", StringType), StructField("body", StringType),
    StructField("json_metadata", StringType), StructField("tags", ArrayType(StringType)),
    StructField("children", IntegerType), StructField("parent_authorperm", StringType),
    StructField("url", StringType), StructField("depth", ShortType)))

  val votes: StructType = StructType(Seq(
    StructField("authorperm", StringType), StructField("token", StringType),
    StructField("voter", StringType), StructField("timestamp", TimestampType),
    StructField("rshares", decimal), StructField("percent", ShortType)))

  val accountHistory: StructType = StructType(Seq(
    StructField("account", StringType), StructField("token", StringType),
    StructField("timestamp", TimestampType), StructField("quantity", decimal),
    StructField("trx", StringType), StructField("type", StringType),
    StructField("authorperm", StringType)))

  val accounts: StructType = StructType(Seq(
    StructField("name", StringType), StructField("symbol", StringType),
    StructField("last_post", TimestampType), StructField("last_root_post", TimestampType),
    StructField("muted", BooleanType), StructField("last_follow_refresh_time", TimestampType)))

  val follows: StructType = StructType(Seq(
    StructField("follower", StringType), StructField("following", StringType),
    StructField("state", ShortType)))   // 0 none / 1 follow / 2 mute

  val reblogs: StructType = StructType(Seq(
    StructField("account", StringType), StructField("authorperm", StringType),
    StructField("timestamp", TimestampType)))

  val tokenConfig: StructType = StructType(Seq(
    StructField("token", StringType), StructField("cashout_window_days", IntegerType),
    StructField("curation_reward_percentage", IntegerType),
    StructField("author_curve_exponent", DecimalType(10, 4)),
    StructField("curation_curve_exponent", DecimalType(10, 4)),
    StructField("beneficiaries_reward_percentage", IntegerType),
    StructField("beneficiaries_account", StringType),
    StructField("promoted_post_account", StringType),
    StructField("reward_pool_id", IntegerType), StructField("token_account", StringType),
    StructField("vote_regeneration_days", IntegerType),
    StructField("downvote_regeneration_days", IntegerType),
    StructField("disable_downvoting", BooleanType),
    StructField("ignore_decline_payout", BooleanType),
    StructField("tags", ArrayType(StringType)), StructField("issuer", StringType)))

  /** Flattened L1 op envelope (stream_blocks.py:225-258; FIXTURES.md §B2).
    * `seq` is the CROSS-STREAM replay order — ingestion must build it with
    * `Schemas.l1Seq(ts, blockNum, opIdx)` (see the encoder scaladoc above)
    * so it totally orders against sidechain seqs.
    */
  val hiveOps: StructType = StructType(Seq(
    StructField("seq", LongType), StructField("ts", TimestampType),
    StructField("op_type", StringType),     // comment | custom_json | delete_comment
    StructField("author", StringType), StructField("permlink", StringType),
    StructField("parent_author", StringType), StructField("parent_permlink", StringType),
    StructField("title", StringType), StructField("body", StringType),
    StructField("json_metadata", StringType),
    StructField("cj_id", StringType),       // follow | reblog | ...
    StructField("cj_json", StringType),
    StructField("posting_auths", ArrayType(StringType)),
    StructField("auths", ArrayType(StringType))))

  /** Flattened sidechain contract event (one row per logs.events[] entry, or
    * per setMute/setPostMute action; FIXTURES.md §B3 flattened).
    */
  val scEvents: StructType = StructType(Seq(
    StructField("seq", LongType), StructField("ts", TimestampType),
    StructField("txid", StringType), StructField("sender", StringType),
    StructField("action", StringType),      // comment | vote | setMute | setPostMute | createRewardPool ...
    StructField("event", StringType),       // newComment | newVote | updateVote | curationReward | ...
    StructField("symbol", StringType),
    StructField("author", StringType), StructField("permlink", StringType),
    StructField("authorperm", StringType),  // reward events carry it directly
    StructField("voter", StringType), StructField("weight", ShortType),
    StructField("rshares", decimal),
    StructField("account", StringType), StructField("quantity", decimal),
    StructField("mute", BooleanType),
    StructField("config", MapType(StringType, StringType))))

  /** Token-transfer op for post promotion (stream_engine_sidechain_blocks.py:60-87). */
  val transfers: StructType = StructType(Seq(
    StructField("seq", LongType), StructField("ts", TimestampType),
    StructField("txid", StringType), StructField("sender", StringType),
    StructField("symbol", StringType), StructField("quantity", StringType),
    StructField("memo", StringType), StructField("to", StringType),
    StructField("has_errors", BooleanType)))
}
