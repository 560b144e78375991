package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.core.{Scores, ThreadTree, Upsert}

/** Write-path replay semantics (SURVEY.md §2.9 batch forms) over the `events`
  * log, plus the composite feed programs of §3.3: the reference's ingestion is
  * a pure fold of an event stream into keyed state, which in batch form is
  * upsert-log compaction + delta re-aggregation — one shuffle per keyed stage,
  * no driver state, replay-idempotent by construction.
  */
object WritePathQueries {

  private val dec = DecimalType(38, 6)
  /** Exact micro-unit output (see RelationalQueries.micro): decimal math stays
    * internal, final column is integer micro-units — hash-stable across engines. */
  private def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c * lit(1000000L)).cast("long")

  val qs: Map[String, Q] = Map(

    // ---- S6/S7/T8: sparse upsert-log compaction with deletes.
    // op=delete resets the key (engine/post_storage.py:407-413); sparse
    // upserts only touch their own columns (score-only updates,
    // processors/engine_comments_contract_processor.py:107-115). ----
    "s6_compact_log" -> Q(
      (s, dir) => {
        val log = Tables.events(s, dir).select(
          col("user_id"),
          col("event_id").as("seq"),
          when(col("event_type") === "error", "delete").otherwise("upsert").as("op"),
          when(col("event_type") === "click", col("value")).as("click_value"),
          when(col("event_type") === "view",
            expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")).as("view_k"))
        Upsert.compactLog(log, Seq("user_id"), "seq", "op")
          .orderBy(col("user_id"))
      },
      Some("""WITH log AS (
          SELECT user_id, event_id AS seq,
                 CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
                 CASE WHEN event_type = 'click' THEN value END AS click_value,
                 CASE WHEN event_type = 'view' THEN try_cast(json_extract_string(props, '$.k') AS BIGINT) END AS view_k
          FROM events),
        last_del AS (SELECT user_id, max(seq) AS dseq FROM log WHERE op = 'delete' GROUP BY 1),
        cur AS (SELECT l.* FROM log l LEFT JOIN last_del d USING (user_id)
                WHERE l.op = 'upsert' AND (d.dseq IS NULL OR l.seq > d.dseq))
        SELECT DISTINCT user_id,
          last_value(click_value IGNORE NULLS) OVER w AS click_value,
          last_value(view_k IGNORE NULLS) OVER w AS view_k
        FROM cur
        WINDOW w AS (PARTITION BY user_id ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id""")),

    // ---- A6: vote-delta maintenance, batch form — latest vote per
    // (post, voter) then re-sum, ≡ the reference's incremental
    // `vote_rshares += new - old` (engine_comments_contract_processor.py:96-115) ----
    "a6_vote_delta" -> Q(
      (s, dir) => {
        val votes = Upsert.latestWins(
          Tables.events(s, dir), Seq("user_id", "event_type"),
          Seq(col("ts"), col("event_id")))
        votes.groupBy(col("user_id"))
          .agg(micro(sum(col("value").cast(dec))).as("vote_rshares"),
               count(lit(1)).as("n_voters"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, cast(sum(cast(value AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS vote_rshares, count(*) AS n_voters
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        GROUP BY 1 ORDER BY user_id""")),

    // ---- J8: recursive thread tree, bounded depth 8
    // (engine/post_storage.py:303-309). Synthetic hierarchy: parent(k) = k/2. ----
    "j8_thread_tree" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val edges = o.select(col("o_orderkey").as("child"),
            expr("o_orderkey div 2").as("parent"))
          .filter(col("child") >= 2)
        val roots = o.filter(col("o_orderkey") === 1).select(col("o_orderkey"))
        ThreadTree.descendants(s, edges, "child", "parent", roots, maxDepth = 8)
          .orderBy(col("node"))
      },
      Some("""WITH RECURSIVE tree(node, depth) AS (
          SELECT o_orderkey, 0 FROM orders WHERE o_orderkey = 1
          UNION ALL
          SELECT o.o_orderkey, t.depth + 1 FROM orders o JOIN tree t ON o.o_orderkey // 2 = t.node
          WHERE t.depth < 8 AND o.o_orderkey >= 2)
        SELECT node, cast(depth AS INT) AS depth FROM tree WHERE depth >= 1 ORDER BY node""")),

    // ---- T7: event fan-out/dispatch into per-table upsert logs
    // (stream dispatch, stream_blocks.py:125-158) ----
    "t7_dispatch" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val posts = e.filter(col("event_type") === "view")
          .select(lit("posts").as("target"), col("event_id"), col("user_id"),
            micro(col("value").cast(dec)).as("quantity"))
        val votes = e.filter(col("event_type") === "click")
          .select(lit("votes").as("target"), col("event_id"), col("user_id"),
            micro(col("value").cast(dec)).as("quantity"))
        val ledger = e.filter(col("event_type") === "purchase")
          .select(lit("account_history").as("target"), col("event_id"), col("user_id"),
            micro(col("value").cast(dec)).as("quantity"))
        posts.unionByName(votes).unionByName(ledger)
          .orderBy(col("event_id"))
      },
      Some("""SELECT CASE event_type WHEN 'view' THEN 'posts' WHEN 'click' THEN 'votes'
                     ELSE 'account_history' END AS target,
               event_id, user_id, cast(cast(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS quantity
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
        ORDER BY event_id""")),

    // ---- T9-extension: sessionization (gaps-and-islands, 30-min gap).
    // ---- tumbling-window counts: the batch face of StreamOps.windowedCounts
    // (same plan incrementalized under a watermark in streaming; DuckDB's
    // epoch-aligned time_bucket reproduces Spark's window() boundaries) ----
    "t11_tumbling_window" -> Q(
      (s, dir) => graft.streaming.StreamOps.windowedCounts(
        Tables.events(s, dir), "ts", "event_type",
        windowDur = "1 hour", watermarkDelay = "1 hour")
        .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
          time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
          event_type, count(*) AS n
        FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""")),

    // The reference has only rolling cutoffs; this is the windowed extension
    // every event pipeline needs, shaped to match Structured Streaming's
    // session_window semantics in batch. ----
    "t9_sessionize" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        e.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_session")).over(byUser))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               min(col("ts")).as("session_start"),
               max(col("ts")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH flagged AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR cast(floor(epoch(ts)) AS BIGINT) - cast(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
          FROM flagged)
        SELECT user_id, cast(session_id AS BIGINT) AS session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id""")),

    // ---- §3.3 composite: get_discussions_by_trending — filter + muted
    // left-join + top-k FIRST, then attach votes to only the page
    // (engine/post_storage.py:360-401 + server/app.py:380-447). At scale the
    // ordering matters: the vote join sees 20 rows, not the table. ----
    "feed_trending" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val acc = Tables.customer(s, dir)
        val page = o
          .filter(col("o_orderstatus") === "O" &&
            col("o_orderdate") > lit("1995-06-01").cast("timestamp"))
          .join(broadcast(acc), o("o_custkey") === acc("c_custkey"), "left")
          .filter(acc("c_custkey").isNull || acc("c_acctbal") >= 0)
          .select(o("o_orderkey"), o("o_custkey"), o("o_totalprice"), acc("c_name"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(20)
        // semi-join the votes down to the 20-row page BEFORE aggregating —
        // at scale the collect_list must never see the full table
        val votes = Tables.lineitem(s, dir)
          .join(broadcast(page.select(col("o_orderkey").as("pk"))),
            col("l_orderkey") === col("pk"), "left_semi")
          .groupBy(col("l_orderkey")).agg(
            count(lit(1)).as("n_votes"),
            concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("voters"))
        page.join(votes, page("o_orderkey") === votes("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("c_name"), col("n_votes"), col("voters"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      },
      Some("""WITH page AS (
          SELECT o_orderkey, o_custkey, o_totalprice, c_name
          FROM orders LEFT JOIN customer ON o_custkey = c_custkey
          WHERE o_orderstatus = 'O' AND o_orderdate > TIMESTAMP '1995-06-01'
            AND (c_custkey IS NULL OR c_acctbal >= 0)
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20)
        SELECT p.o_orderkey, p.o_custkey, p.o_totalprice, p.c_name, v.n_votes, v.voters
        FROM page p LEFT JOIN (
          SELECT l_orderkey, count(*) AS n_votes,
                 string_agg(cast(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS voters
          FROM lineitem GROUP BY 1) v ON p.o_orderkey = v.l_orderkey
        ORDER BY p.o_totalprice DESC, p.o_orderkey ASC""")),

    // ---- §3.3 composite: personal feed — follow semi-join + reblog dedup
    // with MIN(t) + sorted rebloggers + top-k (engine/post_storage.py:336-346) ----
    "feed_personal" -> Q(
      (s, dir) => {
        val followedSup = Tables.supplier(s, dir)
          .filter(col("s_nationkey") === 5).select(col("s_suppkey"))
        val reblogged = Tables.lineitem(s, dir)
          .join(broadcast(followedSup), col("l_suppkey") === col("s_suppkey"), "left_semi")
        val reblogs = reblogged
          .groupBy(col("l_orderkey"))
          .agg(min(col("l_shipdate")).as("t"),
            concat_ws(",", sort_array(collect_set(col("l_suppkey")))).as("reblogged_by"))
        val o = Tables.orders(s, dir)
        o.join(reblogs, o("o_orderkey") === reblogs("l_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"), col("t"), col("reblogged_by"))
          .orderBy(col("t").desc, col("o_orderkey").asc)
          .limit(20)
      },
      Some("""WITH fl AS (SELECT * FROM lineitem
               WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 5))
        SELECT o_orderkey, o_totalprice, t, reblogged_by FROM orders
        JOIN (SELECT l_orderkey, min(l_shipdate) AS t FROM fl GROUP BY 1) tt ON o_orderkey = tt.l_orderkey
        JOIN (SELECT l_orderkey, string_agg(cast(l_suppkey AS VARCHAR), ',' ORDER BY l_suppkey) AS reblogged_by
              FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM fl) GROUP BY 1) ss ON o_orderkey = ss.l_orderkey
        ORDER BY t DESC, o_orderkey ASC LIMIT 20""")),

    // ---- W1 at write time: recompute scores from re-aggregated rshares —
    // the batch replay of score maintenance. Decimal re-sum makes the log10
    // input bit-identical across engines. ----
    "w1_score_recompute" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val rshares = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast(dec)).as("vote_rshares"))
        o.join(rshares, o("o_orderkey") === rshares("l_orderkey"), "inner")
          .select(col("o_orderkey"), micro(col("vote_rshares")).as("vote_rshares"),
            round(Scores.scoreTrend(col("vote_rshares").cast("double"),
              unix_timestamp(col("o_orderdate"))), 4).as("score_trend"),
            round(Scores.scoreHot(col("vote_rshares").cast("double"),
              unix_timestamp(col("o_orderdate"))), 4).as("score_hot"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, cast(vote_rshares * 1000000 AS BIGINT) AS vote_rshares,
          round((CASE WHEN rs > 0 THEN 1.0 ELSE -1.0 END) * log10(greatest(abs(rs), 1.0))
                + cast(floor(epoch(o_orderdate)) AS BIGINT) / 480000.0, 4) AS score_trend,
          round((CASE WHEN rs > 0 THEN 1.0 ELSE -1.0 END) * log10(greatest(abs(rs), 1.0))
                + cast(floor(epoch(o_orderdate)) AS BIGINT) / 10000.0, 4) AS score_hot
        FROM (SELECT o_orderkey, o_orderdate, vote_rshares, cast(vote_rshares AS DOUBLE) AS rs
              FROM orders JOIN (SELECT l_orderkey, sum(cast(l_extendedprice AS DECIMAL(38,6))) AS vote_rshares
                                FROM lineitem GROUP BY 1) v ON o_orderkey = v.l_orderkey)
        ORDER BY o_orderkey"""))
  )
}
