package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Keyset, ThreadTree}

/** The reference's ~20 read endpoints (`server/app.py` →
  * `engine/post_storage.py` etc.) as DataFrame programs over EngineState.
  *
  * Common semantics carried over exactly: token filtering, muted filtering
  * through a LEFT JOIN that may miss (P5), the rolling 30-day window (P3),
  * `h@` hive-mirror selection (P7), keyset pagination by created/score
  * (W4/W5), top-k (§2.6), and the one-join vote attach that replaces the
  * reference's per-row vote loop (J9). `now` is an explicit parameter — the
  * reference's NOW() calls made deterministic.
  *
  * Plan shape at scale: filters reach the posts scan; accounts joins are
  * broadcast (bounded dimension); the page is cut (TakeOrderedAndProject)
  * BEFORE any enrichment join, so votes/metadata joins see `limit` rows.
  */
object Feeds {

  /** hive_select: 0 = engine-native posts only (authorperm NOT LIKE 'h@%'),
    * 1 = hive-mirrored only, 2 = both (`engine/post_storage.py:182-186`).
    */
  private def hivePred(hiveSelect: Int): Column = hiveSelect match {
    case 0 => !col("authorperm").startsWith("h@")
    case 1 => col("authorperm").startsWith("h@")
    case _ => lit(true)
  }

  /** muted filter through LEFT JOIN accounts (engine/post_storage.py:189). */
  private def notMuted(posts: DataFrame, accounts: DataFrame): DataFrame = {
    val acc = accounts.select(col("name"), col("symbol"), col("muted").as("acc_muted"))
    posts.join(broadcast(acc),
        posts("author") === acc("name") && posts("token") === acc("symbol"), "left")
      .filter(!posts("muted") && (acc("name").isNull || !col("acc_muted")))
      .drop("name", "symbol", "acc_muted")
  }

  private def window30d(now: Timestamp): Column =
    col("created") > lit(new Timestamp(now.getTime - 30L * 86400 * 1000))

  private def tagPred(tag: Option[String]): Column =
    tag.map(t => array_contains(col("tags"), t)).getOrElse(lit(true))

  /** Attach votes as a sorted per-post list — one join replacing the
    * reference's N+1 loop (server/app.py:407-416). Votes cast after the
    * post's cashout stay in the list: the reference's `continue` at
    * server/app.py:421-422 only skips timestamp *formatting* of such a
    * vote, which remains in vote_list and is returned in active_votes.
    */
  def attachVotes(page: DataFrame, votes: DataFrame): DataFrame = {
    // the page is `limit` rows — semi-join shrinks the votes scan to the
    // page's posts BEFORE aggregating, so the collect_list never sees the
    // full votes table
    val pageKeys = broadcast(page.select(
      col("authorperm").as("pk_ap"), col("token").as("pk_tok")))
    val v = votes
      .join(pageKeys, col("authorperm") === col("pk_ap") &&
        col("token") === col("pk_tok"), "left_semi")
      .groupBy(col("authorperm").as("v_ap"), col("token").as("v_tok"))
      .agg(sort_array(collect_list(struct(
        col("voter"), col("timestamp").as("ts"), col("rshares"), col("percent"))))
        .as("active_votes"))
    page.join(v, page("authorperm") === col("v_ap") && page("token") === col("v_tok"), "left")
      .drop("v_ap", "v_tok")
      .withColumn("active_votes",
        coalesce(col("active_votes"),
          array().cast("array<struct<voter:string,ts:timestamp,rshares:decimal(38,8),percent:smallint>>")))
  }

  /** /get_discussions_by_created (server/app.py:599-639). */
  def discussionsByCreated(st: EngineState, token: String, now: Timestamp,
      limit: Int = 20, tag: Option[String] = None, hiveSelect: Int = 2,
      anchor: Option[(Timestamp, String)] = None, mainPost: Boolean = true): DataFrame = {
    val base = notMuted(st.posts.filter(col("token") === token.toUpperCase &&
        col("main_post") === mainPost && window30d(now) &&
        tagPred(tag) && hivePred(hiveSelect)), st.accounts)
    Keyset.pageDesc(base, col("created"), col("authorperm"),
      anchor.map { case (ts, ap) => (lit(ts), lit(ap)) }, limit)
  }

  /** /get_discussions_by_{trending,hot,promoted} and payout variants
    * (server/app.py:687-709 → engine/post_storage.py:360-401): same program,
    * parameterized by score column. The promoted variant replicates the
    * reference's score_key='promoted' exactly (post_storage.py:386-388):
    * ordering by the RAW promoted amount with the pending sentinel
    * (last_payout at epoch), promoted > 0, and cashout_time still ahead —
    * attached whenever the promoted column is requested, under either
    * spelling. `pendingOnly` adds the same sentinel to other score keys.
    */
  def discussionsByScore(st: EngineState, token: String, scoreCol: String,
      now: Timestamp, limit: Int = 20, tag: Option[String] = None,
      hiveSelect: Int = 2, mainPost: Boolean = true,
      pendingOnly: Boolean = false,
      anchor: Option[(Double, String)] = None): DataFrame = {
    val promotedVariant = scoreCol == "promoted" || scoreCol == "score_promoted"
    var base = st.posts.filter(col("token") === token.toUpperCase &&
      col("main_post") === mainPost && window30d(now) &&
      tagPred(tag) && hivePred(hiveSelect))
    if (pendingOnly || promotedVariant)
      // the epoch sentinel must be built the same way ContractReplay stores
      // it (session-timezone to_timestamp) — Timestamp.valueOf would use the
      // JVM default zone and silently match nothing when the two differ
      base = base.filter(col("last_payout") === to_timestamp(lit("1970-01-01")) &&
        col("cashout_time") > lit(now))
    if (promotedVariant)
      base = base.filter(col("promoted") > 0)
    val sortCol = if (promotedVariant) col("promoted") else col(scoreCol)
    Keyset.pageDesc(notMuted(base, st.accounts),
      sortCol.cast("double"), col("authorperm"),
      anchor.map { case (s, ap) => (lit(s), lit(ap)) }, limit)
  }

  /** /get_feed (server/app.py:534-596 → engine/post_storage.py:336-346):
    * posts authored or reblogged by followed accounts (excluding the
    * account's own posts), deduped with MIN(t) and the reblogger list,
    * newest first.
    */
  def feed(st: EngineState, token: String, account: String, now: Timestamp,
           limit: Int = 20): DataFrame = {
    val followed = st.follows
      .filter(col("follower") === account && col("state") === 1)
      .select(col("following"))
    // BOTH branches window on the POST's creation time and exclude the
    // account's own posts (the reference's reblog branch carries
    // `p.created > :cutoff AND author NOT IN :accounts` too,
    // post_storage.py:338 — a reblog of a 2-year-old or self-authored post
    // must not enter the feed)
    val eligible = st.posts
      .filter(col("token") === token.toUpperCase && col("main_post") &&
        window30d(now) && col("author") =!= account)
    val authored = eligible
      .join(broadcast(followed), col("author") === col("following"), "left_semi")
      .select(col("authorperm"), col("created").as("t"), lit(null).cast("string").as("reblogged_by"))
    val reblogged = st.reblogs
      .join(broadcast(followed), col("account") === col("following"), "left_semi")
      .join(eligible.select(col("authorperm")).distinct(), Seq("authorperm"), "left_semi")
      .select(col("authorperm"), col("timestamp").as("t"), col("account").as("reblogged_by"))
    val merged = authored.unionByName(reblogged)
      .groupBy(col("authorperm"))
      .agg(min(col("t")).as("t"),
        concat_ws(",", sort_array(collect_set(col("reblogged_by")))).as("reblogged_by"))
    val page = st.posts
      .filter(col("token") === token.toUpperCase && col("main_post"))
      .join(merged, Seq("authorperm"))
    notMuted(page, st.accounts)
      .orderBy(col("t").desc, col("authorperm").asc)
      .limit(limit)
  }

  /** /get_discussions_by_blog (server/app.py:712-771): authored ∪ reblogged
    * by the account itself.
    */
  def blog(st: EngineState, token: String, account: String, now: Timestamp,
           limit: Int = 20): DataFrame = {
    val authored = st.posts
      .filter(col("token") === token.toUpperCase && col("main_post") &&
        col("author") === account)
      .select(col("authorperm"), col("created").as("t"))
    val reblogged = st.reblogs.filter(col("account") === account)
      .select(col("authorperm"), col("timestamp").as("t"))
    val merged = authored.unionByName(reblogged)
      .groupBy(col("authorperm")).agg(min(col("t")).as("t"))
    notMuted(st.posts.filter(col("token") === token.toUpperCase && col("main_post"))
        .join(merged, Seq("authorperm")), st.accounts)
      .orderBy(col("t").desc, col("authorperm").asc)
      .limit(limit)
  }

  /** /get_discussions_by_comments (server/app.py:774-821): the account's
    * replies, newest first.
    */
  def comments(st: EngineState, token: String, account: String,
               limit: Int = 20): DataFrame =
    st.posts.filter(col("token") === token.toUpperCase &&
        !col("main_post") && col("author") === account)
      .orderBy(col("created").desc, col("authorperm").asc)
      .limit(limit)

  /** /get_discussions_by_replies (server/app.py:824-871): replies TO the
    * account's posts, not authored by the account (J5 anti-join semantics).
    */
  def replies(st: EngineState, token: String, account: String,
              limit: Int = 20): DataFrame =
    st.posts.filter(col("token") === token.toUpperCase &&
        col("parent_author") === account && col("author") =!= account)
      .orderBy(col("created").desc, col("authorperm").asc)
      .limit(limit)

  /** /get_thread (server/app.py:497-531 → recursive CTE,
    * engine/post_storage.py:303-309): the comment subtree below a root,
    * depth <= 8, joined back to posts for the token.
    */
  def thread(spark: SparkSession, st: EngineState, token: String,
             rootAuthorperm: String): DataFrame = {
    val edges = st.postMetadata
      .filter(col("parent_authorperm").isNotNull)
      .select(col("authorperm").as("child"), col("parent_authorperm").as("parent"))
    val sub = ThreadTree.descendants(spark, edges, "child", "parent",
      spark.createDataFrame(Seq(Tuple1(rootAuthorperm))).toDF("node"), maxDepth = 8)
    st.posts.filter(col("token") === token.toUpperCase)
      .join(sub, col("authorperm") === col("node"))
      .drop("node")
      .orderBy(col("depth").asc, col("created").asc, col("authorperm").asc)
  }

  /** /get_account_history (server/app.py:225-284 →
    * engine/account_history_storage.py:76-175): newest first, offset
    * emulation capped at 1000 (W7).
    */
  def accountHistory(st: EngineState, account: String, token: Option[String],
                     limit: Int = 20, offset: Int = 0): DataFrame = {
    var h = st.accountHistory.filter(col("account") === account)
    token.foreach(t => h = h.filter(col("token") === t.toUpperCase))
    Keyset.offsetPage(h, Seq(col("timestamp").desc, col("trx").asc),
      limit, offset, cap = 1000)
  }

  /** /@account (server/app.py:287-311): a post's rows across all tokens. */
  def accountPosts(st: EngineState, authorperm: String): DataFrame =
    st.posts.filter(col("authorperm") === authorperm)
      .orderBy(col("token").asc)

  /** /get_following, /get_followers (server/app.py:930-962), capped 1000. */
  def following(st: EngineState, account: String, limit: Int = 1000): DataFrame =
    st.follows.filter(col("follower") === account && col("state") === 1)
      .select(col("following")).orderBy(col("following").asc)
      .limit(math.min(limit, 1000))

  def followers(st: EngineState, account: String, limit: Int = 1000): DataFrame =
    st.follows.filter(col("following") === account && col("state") === 1)
      .select(col("follower")).orderBy(col("follower").asc)
      .limit(math.min(limit, 1000))

  /** /get_follow_count (server/app.py:965-980). */
  def followCount(st: EngineState, account: String): DataFrame =
    // single scan: both counts as conditional sums (the reference runs two
    // COUNT queries; one pass is strictly better at any scale)
    st.follows.filter(col("state") === 1 &&
        (col("follower") === account || col("following") === account))
      .agg(
        // coalesce: the agg over an empty input yields NULL sums, but the
        // reference's COUNT(*) answers 0 for an account with no follows
        coalesce(sum(when(col("follower") === account, 1).otherwise(0)), lit(0))
          .cast("long").as("following_count"),
        coalesce(sum(when(col("following") === account, 1).otherwise(0)), lit(0))
          .cast("long").as("follower_count"))

  /** API-edge row shaping (`format_feed_data`, server/app.py:380-447):
    * authorperm resolved to author+permlink, tags rendered back to the
    * reference's CSV form, timestamps ISO-formatted — the JSON-boundary
    * projection applied AFTER the page is cut, so it touches `limit` rows.
    */
  def formatFeed(page: DataFrame): DataFrame =
    page.withColumn("author",
        regexp_extract(col("authorperm"), "^h?@([^/]+)/.*$", 1))
      .withColumn("permlink",
        regexp_extract(col("authorperm"), "^h?@[^/]+/(.*)$", 1))
      .withColumn("tags_csv", substring(array_join(col("tags"), ","), 1, 256))
      .withColumn("created_iso",
        date_format(col("created"), "yyyy-MM-dd'T'HH:mm:ss"))

  /** /state, /config, /info (server/app.py:83-222): configuration/token
    * dimension reads — the checkpoint registry row plus per-token reward
    * parameters (RPC-enriched fields modeled as the stored columns).
    */
  def configState(st: EngineState, token: String): DataFrame =
    st.tokenConfig.filter(col("token") === token.toUpperCase)

  def info(st: EngineState): DataFrame =
    st.tokenConfig.select(col("token"), col("reward_pool_id"),
      col("cashout_window_days"), col("curation_reward_percentage"),
      col("promoted_post_account"), col("issuer"))
      .orderBy(col("token"))

  /** /get_staked_accounts (server/app.py:356-377): the reference pages the
    * external engine RPC 1000 holders at a time and concatenates the lot; as
    * a data program that loop is a single scan of the holders side-input
    * projected to (name, staked_tokens) — the pagination is an artifact of
    * the RPC transport, not of the semantics, and collapses at any scale.
    * `holders` is the S5-style side-input fixture (account, token, stake).
    */
  def stakedAccounts(holders: DataFrame, token: String): DataFrame =
    holders.filter(col("token") === token.toUpperCase)
      .select(col("account").as("name"), col("stake").as("staked_tokens"))
      .orderBy(col("name").asc)

  /** /get_trending_tags (server/app.py:874-900 →
    * engine/post_storage.py:403-405): tag explode over posts cashed out in
    * the last two weeks, ranked by summed payout (A1).
    */
  def trendingTags(st: EngineState, token: String, now: Timestamp,
                   limit: Int = 20): DataFrame =
    st.posts.filter(col("token") === token.toUpperCase &&
        col("cashout_time") > lit(new Timestamp(now.getTime - 14L * 86400 * 1000)))
      .select(explode(col("tags")).as("tag"), col("total_payout_value"))
      .groupBy(col("tag"))
      .agg(sum(col("total_payout_value")).as("total_payout"))
      .orderBy(col("total_payout").desc, col("tag").asc)
      .limit(limit)
}
