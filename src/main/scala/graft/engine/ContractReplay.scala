package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.core.{Scores, Upsert}

/** Batch replay of the sidechain comments-contract event stream into the
  * state tables (reference: `processors/engine_comments_contract_processor
  * .py:26-304`, driven by `stream_engine_sidechain_blocks.py:44-98`).
  *
  * The reference folds events row-at-a-time into PostgreSQL; this replay
  * derives identical end states set-wise:
  *
  *  - votes:   latest vote row per (authorperm, token, voter)          [T8]
  *  - rshares: the incremental `vote_rshares += new - old` fold reads and
  *             writes PERSISTED state (engine_comments_contract_processor
  *             .py:80-116), so its closed form is Σ_voters last rshares.
  *             The authorReward "zeroing" of vote_rshares/score_trend/
  *             score_hot (py:199-202) mutates only the per-block
  *             `paid_out_posts` dict, whose flush (py:277-304) writes back
  *             total/curator alone — a dead store the replica reproduces
  *             by NOT resetting (bug-compatible)                        [A6]
  *  - scores:  _score(final rshares, ts of *last vote event*) — the
  *             reference stamps scores with the vote block's time, not the
  *             post's creation time; never-voted posts keep the DDL
  *             `real DEFAULT 0 NOT NULL` (sql/engine.sql:92-93)         [W1]
  *  - payouts: the flush persists only total_payout_value (all reward
  *             types) and curator_payout_value (curation only);
  *             beneficiaries_payout_value stays at its DDL default 0 and
  *             last_payout at epoch — both dict-only in the reference.
  *             beneficiaryReward rows log history type "curation_reward"
  *             (reference quirk, py:178)                                [A7]
  *
  * Every derivation is a groupBy/window keyed by (authorperm, token[, voter])
  * — linear shuffles, replay-idempotent, no driver state.
  */
object ContractReplay {

  import Schemas.decimal

  private def ap(author: Column, permlink: Column): Column =
    Schemas.authorperm(author, permlink)

  private def voteEvents(ev: DataFrame): DataFrame =
    ev.filter(col("event").isin("newVote", "updateVote"))
      .select(col("seq"), col("ts"), col("symbol").as("token"),
        ap(col("author"), col("permlink")).as("authorperm"),
        col("voter"), col("weight"), col("rshares"))

  /** Current votes table: latest vote per (authorperm, token, voter). */
  def votesState(ev: DataFrame): DataFrame =
    Upsert.latestWins(voteEvents(ev), Seq("authorperm", "token", "voter"), Seq(col("seq")))
      .select(col("authorperm"), col("token"), col("voter"),
        col("ts").as("timestamp"), col("rshares"),
        col("weight").cast("short").as("percent"))

  /** Reward ledger (account_history): one row per reward event with
    * quantity > 0. beneficiaryReward logs as "curation_reward" — replicated.
    */
  def accountHistoryState(ev: DataFrame): DataFrame =
    ev.filter(col("event").isin("curationReward", "beneficiaryReward", "authorReward") &&
        col("quantity") > 0)
      .select(col("account"), col("symbol").as("token"), col("ts").as("timestamp"),
        col("quantity"),
        col("txid").as("trx"),
        when(col("event") === "authorReward", "author_reward")
          .otherwise("curation_reward").as("type"),
        col("authorperm"))

  /** Accounts muted state from setMute actions (latest wins per account+token). */
  def accountMutes(ev: DataFrame): DataFrame =
    Upsert.latestWins(
      ev.filter(col("action") === "setMute")
        .select(col("seq"), col("account").as("name"), col("symbol").as("symbol"),
          col("mute")),
      Seq("name", "symbol"), Seq(col("seq")))
      .select("name", "symbol", "mute")

  /** Posts state from the full event stream + token config + L1 deletes.
    *
    * @param ev        flattened sidechain events (Schemas.scEvents)
    * @param tokenCfg  token_config (for cashout_window_days)
    * @param deletes   (seq, authorperm) L1 delete_comment ops — tombstones
    * @param transfers valid promotion transfers, pre-parsed: (seq, token,
    *                  authorperm, amount decimal) — see Promotion.parse
    */
  def postsState(ev: DataFrame, tokenCfg: DataFrame,
                 deletes: DataFrame, transfers: DataFrame): DataFrame = {
    // --- creation: newComment upserts; L1 deletes tombstone ALL tokens of an
    // authorperm; a newComment after the delete revives the post -------------
    val creates = ev.filter(col("event") === "newComment")
      .select(col("seq"), col("ts"), col("symbol").as("token"),
        col("author"), ap(col("author"), col("permlink")).as("authorperm"))
    val lastDelete = deletes.groupBy(col("authorperm"))
      .agg(max(col("seq")).as("del_seq"))
    val base = Upsert.latestWins(creates, Seq("authorperm", "token"), Seq(col("seq")))
      .join(lastDelete, Seq("authorperm"), "left")
      .filter(col("del_seq").isNull || col("seq") > col("del_seq"))
      .join(broadcast(tokenCfg.select(col("token"), col("cashout_window_days"))),
        Seq("token"), "left")
      .withColumn("cwd", coalesce(col("cashout_window_days"), lit(7)))
      .select(col("authorperm"), col("token"), col("author"),
        col("ts").as("created"), col("seq").as("created_seq"),
        expr("ts + make_dt_interval(cwd)").as("cashout_time"))

    // --- vote_rshares: closed form of the persisted delta fold --------------
    // `+= new − old` over persisted state telescopes to the last rshares per
    // voter; the reference's authorReward reset is a dict-only dead store
    // (never flushed), so no reset boundary exists in persisted state
    val perVoter = voteEvents(ev)
      .groupBy(col("authorperm"), col("token"), col("voter"))
      .agg(max(struct(col("seq"), col("rshares"))).as("last"))
    val rshares = perVoter.groupBy(col("authorperm"), col("token"))
      .agg(sum(col("last.rshares")).cast(decimal).as("vote_rshares"))

    // --- scores: stamped at the last vote event's block time ----------------
    val lastVote = voteEvents(ev).groupBy(col("authorperm"), col("token"))
      .agg(max(struct(col("seq"), col("ts"))).as("lv"))
      .select(col("authorperm"), col("token"),
        col("lv.seq").as("last_vote_seq"), col("lv.ts").as("last_vote_ts"))

    // --- payout accumulation: only the columns the reference's flush
    // actually writes back (total from ALL reward types, curator from
    // curation); beneficiaries/last_payout are dict-only dead stores -------
    val rewards = ev.filter(
        col("event").isin("curationReward", "beneficiaryReward", "authorReward"))
      .groupBy(col("authorperm"), col("symbol").as("token"))
      .agg(
        sum(col("quantity")).cast(decimal).as("total_payout_value"),
        sum(when(col("event") === "curationReward", col("quantity"))
          .otherwise(lit(0))).cast(decimal).as("curator_payout_value"))

    // --- muted: author's mute state as-of creation, overridden by later
    // setPostMute actions. Both are "last value by seq" over a merged stream.
    val muteStream =
      ev.filter(col("action") === "setMute")
        .select(col("seq"), col("account").as("author"), col("symbol").as("token"),
          col("mute"))
    val creationMute = base.as("b").join(muteStream.as("m"),
        col("b.author") === col("m.author") && col("b.token") === col("m.token") &&
        col("m.seq") < col("b.created_seq"), "left")
      .groupBy(col("b.authorperm"), col("b.token"))
      .agg(max(struct(col("m.seq"), col("m.mute"))).as("am"))
      .select(col("authorperm"), col("token"),
        coalesce(col("am.mute"), lit(false)).as("creation_muted"))
    val postMute = Upsert.latestWins(
        ev.filter(col("action") === "setPostMute")
          .select(col("seq"), col("authorperm"), col("symbol").as("token"), col("mute")),
        Seq("authorperm", "token"), Seq(col("seq")))
      .select(col("authorperm"), col("token"), col("mute").as("post_muted"),
        col("seq").as("post_mute_seq"))

    // --- promotion: cumulative promoted amount + score at created time ------
    val promoted = transfers.groupBy(col("authorperm"), col("token"))
      .agg(sum(col("amount")).cast(decimal).as("promoted"))

    // --- assemble -----------------------------------------------------------
    val keys = Seq("authorperm", "token")
    base
      .join(rshares, keys, "left")
      .join(lastVote, keys, "left")
      .join(rewards, keys, "left")
      .join(creationMute, keys, "left")
      .join(postMute, keys, "left")
      .join(promoted, keys, "left")
      .withColumn("vote_rshares",
        coalesce(col("vote_rshares"), lit(0).cast(decimal)))
      .withColumn("rs_d", col("vote_rshares").cast("double"))
      .select(
        col("authorperm"), col("token"), col("author"), col("created"),
        col("cashout_time"),
        // the reference's flush never persists last_payout for existing posts
        // (and is a no-op for unknown ones) — DDL default epoch survives
        to_timestamp(lit("1970-01-01")).as("last_payout"),
        col("vote_rshares"),
        // never-voted posts keep `real DEFAULT 0 NOT NULL` — NULL here would
        // also silently drop them from keyset score anchors
        when(col("last_vote_seq").isNotNull,
            Scores.scoreTrend(col("rs_d"), unix_timestamp(col("last_vote_ts"))))
          .otherwise(lit(0.0))
          .cast("float").as("score_trend"),
        when(col("last_vote_seq").isNotNull,
            Scores.scoreHot(col("rs_d"), unix_timestamp(col("last_vote_ts"))))
          .otherwise(lit(0.0))
          .cast("float").as("score_hot"),
        coalesce(col("total_payout_value"), lit(0).cast(decimal)).as("total_payout_value"),
        coalesce(col("curator_payout_value"), lit(0).cast(decimal)).as("curator_payout_value"),
        // dict-only in the reference — persisted column stays at DDL 0
        lit(0).cast(decimal).as("beneficiaries_payout_value"),
        coalesce(col("promoted"), lit(0).cast(decimal)).as("promoted"),
        when(col("promoted").isNotNull,
            Scores.score(col("promoted").cast("double"), unix_timestamp(col("created")), 480000L))
          .otherwise(lit(0.0))
          .cast("float").as("score_promoted"),
        // a setPostMute applies only to the CURRENT incarnation: newComment
        // re-initializes muted from the author's account state
        // (engine_comments_contract_processor.py:62-72), and delete_comment
        // removes the row — so a mute that predates the (re-)creating
        // newComment must not resurrect onto the new post
        coalesce(when(col("post_mute_seq") > col("created_seq"), col("post_muted")),
          col("creation_muted"), lit(false)).as("muted"),
        col("created_seq"))
  }

  /** token_config: initial dimension rows + createRewardPool/updateRewardPool
    * sparse upserts merged per column (the reference widens the table
    * dynamically; we merge into the declared superset schema).
    */
  def tokenConfigState(ev: DataFrame, initial: DataFrame): DataFrame = {
    val cfgEv = ev.filter(col("event").isin("createRewardPool", "updateRewardPool"))
      .select(col("seq"), col("symbol").as("token"),
        col("config")("postRewardCurveParameter").cast(DecimalType10_4).as("author_curve_exponent"),
        col("config")("curationRewardCurveParameter").cast(DecimalType10_4).as("curation_curve_exponent"),
        col("config")("curationRewardPercentage").cast("int").as("curation_reward_percentage"),
        col("config")("cashoutWindowDays").cast("int").as("cashout_window_days"),
        col("config")("voteRegenerationDays").cast("int").as("vote_regeneration_days"),
        col("config")("downvoteRegenerationDays").cast("int").as("downvote_regeneration_days"),
        // null (absent) stays null for the sparse merge; explicit "" is an
        // explicit empty tag list, NOT [""]
        when(col("config")("tags") === "", array().cast(ArrayType(StringType)))
          .otherwise(split(col("config")("tags"), ",")).as("tags"),
        col("sender").as("issuer"),
        coalesce(col("config")("disableDownvote").cast("boolean"), lit(false)).as("disable_downvoting"),
        coalesce(col("config")("ignoreDeclinePayout").cast("boolean"), lit(false)).as("ignore_decline_payout"),
        // createRewardPool carries the pool id in data._id; null on update
        // events keeps the prior value through the sparse-upsert compaction
        col("config")("_id").cast("int").as("reward_pool_id"))
    val evCols = cfgEv.columns.filterNot(c => c == "seq" || c == "token")
    // columns only the initial dimension carries (never updated by events)
    val staticCols = Seq("promoted_post_account",
      "beneficiaries_reward_percentage", "beneficiaries_account", "token_account")
    val initAligned = initial
      .select(("token" +: (evCols ++ staticCols)).map(col): _*)
      .withColumn("seq", lit(Long.MinValue))
    val evAligned = staticCols.foldLeft(cfgEv) { (df, c) =>
      df.withColumn(c, lit(null).cast(initial.schema(c).dataType))
    }
    val cols = ("seq" +: "token" +: (evCols ++ staticCols)).map(col)
    val log = initAligned.select(cols: _*)
      .unionByName(evAligned.select(cols: _*))
      .withColumn("op", lit("upsert"))
    Upsert.compactLog(log, Seq("token"), "seq", "op")
  }

  private val DecimalType10_4 = org.apache.spark.sql.types.DecimalType(10, 4)
}
