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
  /** -> (seq, token, authorperm, amount) for valid promotion transfers.
    *
    * `ppaTimeline`: (token, seq, promoted_post_account) — the configured
    * promotion account OVER TIME (initial config at seq = Long.MinValue plus
    * issuer tribe-settings changes). Validity is as-of: a transfer counts iff
    * its target equals the account configured at the transfer's seq, exactly
    * like the reference's sequential check
    * (stream_engine_sidechain_blocks.py:60-87).
    */
  def parse(transfers: DataFrame, ppaTimeline: DataFrame): DataFrame = {
    val base = transfers
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
    val cfg = ppaTimeline.select(col("token").as("cfg_token"),
      col("seq").as("cfg_seq"), col("promoted_post_account").as("ppa"))
    // as-of: latest config row at or before the transfer (config is tiny ->
    // broadcast; the "join" is a per-transfer max over a handful of rows)
    base.join(broadcast(cfg),
        col("symbol") === col("cfg_token") && col("cfg_seq") <= col("seq"), "left")
      .groupBy(col("seq"), col("symbol"), col("authorperm"), col("amount"), col("to"))
      .agg(max(struct(col("cfg_seq"), col("ppa"))).as("asof"))
      .filter(col("to") === col("asof.ppa"))
      .select(col("seq"), col("symbol").as("token"), col("authorperm"), col("amount"))
  }
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
    val tokenConfig0 = ContractReplay.tokenConfigState(scEvents, initialTokenConfig)
    // L1 tribe-settings override of promoted_post_account (issuer-gated):
    // a timeline of (token, seq, account) for the as-of promotion check,
    // and latest-wins folded into the current config table
    val tribeOps = HiveOpsReplay.tribeSettings(hiveOps, tokenConfig0)
    val ppaTimeline = tokenConfig0
      .select(col("token"), lit(Long.MinValue).as("seq"), col("promoted_post_account"))
      .unionByName(tribeOps)
    val tribeLatest = Upsert.latestWins(tribeOps, Seq("token"), Seq(col("seq")))
      .select(col("token"), col("promoted_post_account").as("tribe_ppa"))
    val tokenConfig = tokenConfig0.join(tribeLatest, Seq("token"), "left")
      .withColumn("promoted_post_account",
        coalesce(col("tribe_ppa"), col("promoted_post_account")))
      .drop("tribe_ppa")
    val promo = Promotion.parse(transfers, ppaTimeline)
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

  /** Persist the state tables as parquet with a scale-ready layout: posts
    * and votes partitioned by token (the universal query predicate — every
    * endpoint filters one token, so partition pruning removes all other
    * tokens from every scan); the rest written plain. At cluster scale the
    * same call would add bucketing by authorperm for shuffle-free vote/
    * metadata joins.
    */
  def save(st: EngineState, dir: String): Unit = {
    st.posts.write.mode("overwrite").partitionBy("token").parquet(s"$dir/posts")
    st.votes.write.mode("overwrite").partitionBy("token").parquet(s"$dir/votes")
    st.postMetadata.write.mode("overwrite").parquet(s"$dir/post_metadata")
    st.accountHistory.write.mode("overwrite").partitionBy("token").parquet(s"$dir/account_history")
    st.accounts.write.mode("overwrite").parquet(s"$dir/accounts")
    st.follows.write.mode("overwrite").parquet(s"$dir/follows")
    st.reblogs.write.mode("overwrite").parquet(s"$dir/reblogs")
    st.tokenConfig.write.mode("overwrite").parquet(s"$dir/token_config")
  }

  /** Bucketed persistence for the hot join keys: posts, votes, and
    * post_metadata are written bucketBy(authorperm) via saveAsTable (the
    * DataFrame parquet writer cannot record bucket specs), so the engine's
    * highest-volume joins — vote attach (J9), metadata enrich (J2), thread
    * expansion — read co-located sides and plan with NO shuffle Exchange on
    * either input. At 100 TB this is the difference between re-shuffling the
    * votes table per page query and a pure map-side join; a spec asserts the
    * Exchange-free plan.
    *
    * Tables land in the session's warehouse under `<db>` (set
    * `spark.sql.warehouse.dir` to shared storage in a deployment).
    */
  def saveBucketed(st: EngineState, db: String, numBuckets: Int = 64): Unit = {
    val spark = st.posts.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(numBuckets, "authorperm").sortBy("authorperm")
        .format("parquet").saveAsTable(s"$db.$table")
    write(st.posts, "posts")
    write(st.votes, "votes")
    write(st.postMetadata, "post_metadata")
  }

  def loadBucketed(spark: SparkSession, db: String): (DataFrame, DataFrame, DataFrame) =
    (spark.table(s"$db.posts"), spark.table(s"$db.votes"),
      spark.table(s"$db.post_metadata"))

  def load(spark: SparkSession, dir: String): EngineState = EngineState(
    posts = spark.read.parquet(s"$dir/posts"),
    postMetadata = spark.read.parquet(s"$dir/post_metadata"),
    votes = spark.read.parquet(s"$dir/votes"),
    accountHistory = spark.read.parquet(s"$dir/account_history"),
    accounts = spark.read.parquet(s"$dir/accounts"),
    follows = spark.read.parquet(s"$dir/follows"),
    reblogs = spark.read.parquet(s"$dir/reblogs"),
    tokenConfig = spark.read.parquet(s"$dir/token_config"))

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
