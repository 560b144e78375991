package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.{EngineState, Feeds}

/** The engine.Feeds endpoint programs driven through the driver's oracle gate
  * by mapping the TPC-H-ish test tables onto reference-shaped state (orders ≈
  * posts, customer ≈ accounts, lineitem ≈ votes/follow edges, events ≈
  * account_history). This proves the REAL API code paths — not ad-hoc
  * re-implementations — against DuckDB.
  */
object EndpointQueries {

  private def empty(s: SparkSession) = s.emptyDataFrame

  /** orders+customer → (posts, accounts) analog state. */
  private def analogState(s: SparkSession, dir: String): EngineState = {
    val posts = Tables.orders(s, dir).select(
      col("o_orderkey").cast("string").as("authorperm"),
      col("o_orderstatus").as("token"),
      col("o_custkey").cast("string").as("author"),
      col("o_orderdate").as("created"),
      split(col("o_orderpriority"), "-").as("tags"),
      (col("o_orderkey") % 2 === 0).as("main_post"),
      col("o_totalprice").cast("float").as("score_trend"),
      col("o_totalprice").cast(Tables.dec).as("promoted"),
      col("o_totalprice").cast("float").as("score_promoted"),
      lit(false).as("muted"),
      to_timestamp(lit("1970-01-01")).as("last_payout"),
      (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("cashout_time"))
    val accounts = Tables.customer(s, dir).select(
      col("c_custkey").cast("string").as("name"),
      lit("O").as("symbol"),
      (col("c_acctbal") < 0).as("muted"))
    EngineState(posts, empty(s), empty(s), accountHistoryAnalog(s, dir),
      accounts, followsAnalog(s, dir), empty(s), empty(s))
  }

  private def accountHistoryAnalog(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id").cast("string").as("account"),
      upper(col("event_type")).as("token"),
      col("ts").as("timestamp"),
      col("value").cast(Tables.dec).as("quantity"),
      col("event_id").cast("string").as("trx"),
      col("event_type").as("type"),
      col("event_id").cast("string").as("authorperm"))

  private def followsAnalog(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_suppkey").cast("string").as("follower"),
      col("l_partkey").cast("string").as("following"),
      when(col("l_quantity") > 25, 1).otherwise(0).cast("short").as("state"))
      .distinct()

  val qs: Map[String, Q] = Map(

    // ---- get_discussions_by_trending through the real Feeds program ----
    "e1_feed_trending" -> Q(
      (s, dir) => Feeds.discussionsByScore(
        analogState(s, dir), "O", "score_trend",
        Timestamp.valueOf("1996-07-01 00:00:00"), limit = 20)
        .select(col("authorperm"), col("author"), col("score_trend").cast("double").as("score"))
        .orderBy(col("score").desc, col("authorperm").asc),
      // the analog posts are status-O orders; muted filter drops authors with
      // negative acctbal (accounts analog); 30-day window before 1996-07-01
      Some("""SELECT cast(o_orderkey AS VARCHAR) AS authorperm,
               cast(o_custkey AS VARCHAR) AS author,
               cast(cast(o_totalprice AS FLOAT) AS DOUBLE) AS score
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O' AND o_orderkey % 2 = 0
          AND o_orderdate > TIMESTAMP '1996-06-01'
          AND (c_custkey IS NULL OR c_acctbal >= 0)
        ORDER BY cast(o_totalprice AS FLOAT) DESC, cast(o_orderkey AS VARCHAR) ASC
        LIMIT 20""")),

    // ---- get_discussions_by_created with tag filter + keyset anchor ----
    "e2_feed_created" -> Q(
      (s, dir) => Feeds.discussionsByCreated(
        analogState(s, dir), "O", Timestamp.valueOf("1996-07-01 00:00:00"),
        limit = 20, tag = Some("1"),
        anchor = Some((Timestamp.valueOf("1996-06-25 00:00:00"), "0")))
        .select(col("authorperm"), col("created")),
      Some("""SELECT cast(o_orderkey AS VARCHAR) AS authorperm, o_orderdate AS created
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O' AND o_orderkey % 2 = 0
          AND o_orderdate > TIMESTAMP '1996-06-01'
          AND list_contains(string_split(o_orderpriority, '-'), '1')
          AND (c_custkey IS NULL OR c_acctbal >= 0)
          AND (o_orderdate < TIMESTAMP '1996-06-25'
               OR (o_orderdate = TIMESTAMP '1996-06-25' AND cast(o_orderkey AS VARCHAR) > '0'))
        ORDER BY o_orderdate DESC, cast(o_orderkey AS VARCHAR) ASC LIMIT 20""")),

    // ---- get_account_history offset paging through the real program ----
    "e3_account_history" -> Q(
      (s, dir) => Feeds.accountHistory(
        analogState(s, dir), "7", Some("click"), limit = 5, offset = 2)
        // micro-unit BIGINT output: decimal quantities hash differently across
        // Spark-parquet and DuckDB decimal128 in the driver's canonicalizer
        .select(col("account"), col("timestamp"),
          (col("quantity") * lit(1000000L)).cast("long").as("quantity"), col("trx")),
      Some("""SELECT cast(user_id AS VARCHAR) AS account, ts AS timestamp,
               cast(cast(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS quantity, cast(event_id AS VARCHAR) AS trx
        FROM events WHERE user_id = 7 AND upper(event_type) = 'CLICK'
        ORDER BY ts DESC, cast(event_id AS VARCHAR) ASC LIMIT 5 OFFSET 2""")),

    // ---- get_staked_accounts through the real program (holders side-input
    // analog: customers hold token 'O' with stake = acctbal) ----
    "e5_staked_accounts" -> Q(
      (s, dir) => Feeds.stakedAccounts(
        Tables.customer(s, dir).select(
          col("c_custkey").cast("string").as("account"),
          lit("O").as("token"),
          col("c_acctbal").as("stake")),
        "o"),
      Some("""SELECT cast(c_custkey AS VARCHAR) AS name, c_acctbal AS staked_tokens
        FROM customer ORDER BY name ASC""")),

    // ---- format_feed_data (the S9 API-edge projection) through the real
    // program: authorperm split, CSV tags, ISO timestamps ----
    "e6_format_feed" -> Q(
      (s, dir) => Feeds.formatFeed(
        Tables.orders(s, dir).filter(col("o_orderkey") < 100)
          .select(
            concat(lit("@"), col("o_custkey").cast("string"), lit("/"),
              col("o_orderkey").cast("string")).as("authorperm"),
            split(col("o_orderpriority"), "-").as("tags"),
            col("o_orderdate").as("created")))
        .select("authorperm", "author", "permlink", "tags_csv", "created_iso")
        .orderBy(col("authorperm")),
      Some("""SELECT '@' || cast(o_custkey AS VARCHAR) || '/' || cast(o_orderkey AS VARCHAR) AS authorperm,
          cast(o_custkey AS VARCHAR) AS author,
          cast(o_orderkey AS VARCHAR) AS permlink,
          substring(array_to_string(string_split(o_orderpriority, '-'), ','), 1, 256) AS tags_csv,
          strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS created_iso
        FROM orders WHERE o_orderkey < 100 ORDER BY authorperm""")),

    // ---- get_follow_count through the real program ----
    "e4_follow_count" -> Q(
      (s, dir) => Feeds.followCount(analogState(s, dir), "17"),
      Some("""SELECT
          (SELECT count(*) FROM (SELECT DISTINCT cast(l_suppkey AS VARCHAR) AS follower,
             cast(l_partkey AS VARCHAR) AS following,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS state FROM lineitem)
           WHERE follower = '17' AND state = 1) AS following_count,
          (SELECT count(*) FROM (SELECT DISTINCT cast(l_suppkey AS VARCHAR) AS follower,
             cast(l_partkey AS VARCHAR) AS following,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS state FROM lineitem)
           WHERE following = '17' AND state = 1) AS follower_count"""))
  )
}
