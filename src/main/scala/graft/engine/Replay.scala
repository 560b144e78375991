package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Upsert

/** Full engine state: the nine reference tables as DataFrames. */
case class EngineState(
    posts: DataFrame,
    postMetadata: DataFrame,
    votes: DataFrame,
    accountHistory: DataFrame,
    accounts: DataFrame,
    follows: DataFrame,
    reblogs: DataFrame,
    tokenConfig: DataFrame)

/** Promotion transfers (`processors/engine_promote_post_processor.py:27-100` +
  * dispatch `stream_engine_sidechain_blocks.py:60-87`): a tokens.transfer to
  * the token's promoted_post_account whose memo contains `h?@author/permlink`
  * adds its quantity to the post's promoted total.
  */
object Promotion {
  /** -> (seq, token, authorperm, amount) for valid promotion transfers. */
  def parse(transfers: DataFrame, tokenConfig: DataFrame): DataFrame =
    transfers
      .filter(!coalesce(col("has_errors"), lit(false)) &&     // check_engine_op
        col("symbol").isNotNull && col("quantity").isNotNull)
      .withColumn("amount", expr("try_cast(quantity AS DECIMAL(38,8))"))
      .filter(col("amount").isNotNull)                        // F14 validation
      .withColumn("memo_clean",                               // strip quoting
        when(col("memo").startsWith("'") || col("memo").startsWith("\""),
          expr("substring(memo, 2, length(memo) - 2)")).otherwise(col("memo")))
      .withColumn("authorperm",                               // F10 memo regex
        regexp_extract(col("memo_clean"), "h?@.*", 0))
      .filter(length(col("authorperm")) > 0)
      .join(broadcast(tokenConfig
          .select(col("token"), col("promoted_post_account"))),
        col("symbol") === col("token") && col("to") === col("promoted_post_account"),
        "left_semi")
      .select(col("seq"), col("symbol").as("token"), col("authorperm"), col("amount"))
}

/** Batch replay orchestration: fold both input streams into EngineState.
  * Deterministic, replay-idempotent, and identical to the reference's
  * sequential fold under the T2 alignment guarantee (the L1 stream is
  * processed only after the sidechain stream has passed the same event time —
  * `stream_blocks.py:86-93`).
  */
object Replay {

  def replay(spark: SparkSession, hiveOps: DataFrame, scEvents: DataFrame,
             transfers: DataFrame, initialTokenConfig: DataFrame): EngineState = {

    val deletes = HiveOpsReplay.deletes(hiveOps)
    val tokenConfig = ContractReplay.tokenConfigState(scEvents, initialTokenConfig)
    val promo = Promotion.parse(transfers, tokenConfig)
    val postsCore = ContractReplay.postsState(scEvents, tokenConfig, deletes, promo)

    val l1 = HiveOpsReplay.l1PostFields(hiveOps)
    val children = HiveOpsReplay.childrenCounts(hiveOps, postsCore)

    val posts = postsCore
      .join(l1, Seq("authorperm"), "left")
      .join(children, Seq("authorperm"), "left")
      .select(
        col("authorperm"), col("token"), col("author"), col("created"),
        coalesce(col("tags"), array().cast("array<string>")).as("tags"),
        col("app"),
        coalesce(col("main_post"), lit(false)).as("main_post"),
        lit(false).as("decline_payout"),
        col("vote_rshares"), col("cashout_time"), col("last_payout"),
        col("total_payout_value"), col("curator_payout_value"),
        col("score_trend"), col("score_hot"),
        col("beneficiaries_payout_value"), col("promoted"),
        col("title"), col("desc"),
        coalesce(col("children"), lit(0)).as("children"),
        col("parent_author"), col("parent_permlink"),
        col("score_promoted"), col("muted"))

    val postMetadata = HiveOpsReplay.postMetadataState(spark, hiveOps, children)

    val accountsMerged = mergeAccounts(
      HiveOpsReplay.accountActivity(hiveOps), ContractReplay.accountMutes(scEvents))

    EngineState(
      posts = posts,
      postMetadata = postMetadata,
      votes = ContractReplay.votesState(scEvents),
      accountHistory = ContractReplay.accountHistoryState(scEvents),
      accounts = accountsMerged,
      follows = HiveOpsReplay.followsState(hiveOps),
      reblogs = HiveOpsReplay.reblogsState(hiveOps,
        posts.filter(col("main_post"))),
      tokenConfig = tokenConfig)
  }

  /** accounts = L1 activity (keyed by name only in the reference's practice)
    * × sidechain mutes (keyed name+symbol): full outer, activity broadcast to
    * every symbol the account is muted/active under.
    */
  private def mergeAccounts(activity: DataFrame, mutes: DataFrame): DataFrame =
    activity.withColumnRenamed("name", "a_name")
      .join(mutes, col("a_name") === col("name"), "full_outer")
      .select(
        coalesce(col("name"), col("a_name")).as("name"),
        coalesce(col("symbol"), lit("")).as("symbol"),
        col("last_post"), col("last_root_post"),
        coalesce(col("mute"), lit(false)).as("muted"),
        lit(null).cast("timestamp").as("last_follow_refresh_time"))
}
