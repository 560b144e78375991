package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.core.{Keyset, Upsert}

/** The reference's relational read path (SURVEY.md §2.2-2.7), mapped onto the
  * driver test tables per FIXTURES.md §A: orders ≈ posts (o_orderdate ≈ created,
  * o_totalprice ≈ score), customer ≈ accounts (negative acctbal ≈ muted),
  * lineitem ≈ votes, events ≈ the upsert/event log.
  *
  * Every query is a pure Catalyst plan: filters/projections push to the parquet
  * scan, joins pick broadcast sides automatically (dims are small), top-k plans
  * as TakeOrderedAndProject — nothing here would change shape at 100 TB except
  * partition counts.
  */
object RelationalQueries {

  private val dec = DecimalType(38, 6)
  private def d(c: Column): Column = c.cast(dec)
  /** Exact micro-unit output: DECIMAL(38,6) math stays internal (deterministic
    * sums), but the FINAL column is scaled to integer micro-units. Spark-parquet
    * decimals and DuckDB decimal128 canonicalize differently in the driver's
    * hasher; a BIGINT is bit-identical on both sides with zero float rounding.
    */
  private def micro(c: Column): Column = (c * lit(1000000L)).cast("long")

  val qs: Map[String, Q] = Map(

    // ---- flagship aggregation (TPC-H Q1 shape; reference A1-family) ----
    "q1_agg" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          micro(sum(d(col("l_quantity")))).as("sum_qty"),
          micro(sum(d(col("l_extendedprice")))).as("sum_price"),
          micro(sum(d(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("sum_disc_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        cast(sum(cast(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty,
        cast(sum(cast(l_extendedprice AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_price,
        cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_disc_price,
        count(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- P1: PK point lookup (engine/post_storage.py:141-143) ----
    "p1_point_lookup" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderkey") === 100)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM orders WHERE o_orderkey = 100")),

    // ---- P2: secondary-key scan (engine/post_storage.py:92-97) ----
    "p2_secondary_scan" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_orderkey") === 100)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .orderBy(col("l_linenumber")),
      Some("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM lineitem WHERE l_orderkey = 100 ORDER BY l_linenumber")),

    // ---- P3: time-range predicate (rolling window, engine/post_storage.py:103-125) ----
    "p3_time_range" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' ORDER BY o_orderkey")),

    // ---- P4: sentinel predicate ("pending payout", engine/post_storage.py:109-125) ----
    "p4_sentinel_pending" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "O" &&
                col("o_orderdate") > lit("2000-06-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, o_orderdate, o_totalprice FROM orders WHERE o_orderstatus = 'O' AND o_orderdate > TIMESTAMP '2000-06-01' ORDER BY o_orderkey")),

    // ---- P5 + J1: muted filtering through a LEFT JOIN that may miss
    // (engine/post_storage.py:189 — `acc IS NULL OR acc.muted = false`) ----
    "p5_muted_filter" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val acc = Tables.customer(s, dir).filter(col("c_custkey") < 750)
        o.join(broadcast(acc), o("o_custkey") === acc("c_custkey"), "left")
          .filter(acc("c_custkey").isNull || acc("c_acctbal") >= 0)
          .select(o("o_orderkey"), o("o_custkey"), acc("c_name"), acc("c_acctbal"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, c_name, c_acctbal
        FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_custkey < 750) c
          ON o_custkey = c_custkey
        WHERE c_custkey IS NULL OR c_acctbal >= 0 ORDER BY o_orderkey""")),

    // ---- P6: tag membership via array contains (engine/post_storage.py:179) ----
    "p6_tag_membership" -> Q(
      (s, dir) => Tables.part(s, dir)
        .filter(array_contains(split(col("p_name"), " "), "red"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy(col("p_partkey")),
      Some("SELECT p_partkey, p_name, p_brand FROM part WHERE list_contains(string_split(p_name, ' '), 'red') ORDER BY p_partkey")),

    // ---- P7: prefix predicate (hive_select LIKE 'h@%', engine/post_storage.py:182-186) ----
    "p7_prefix_select" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .filter(col("c_name").startsWith("Customer#00000012"))
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey")),
      Some("SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#00000012%' ORDER BY c_custkey")),

    // ---- P8: main-post/comment split (parameterized boolean filter) ----
    "p8_main_split" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderkey") % 2 === 0 && col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy(col("o_orderkey")),
      Some("SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0 AND o_orderstatus = 'F' ORDER BY o_orderkey")),

    // ---- P9/F5: authorperm-style split projection (server/app.py:392) ----
    "p9_split_project" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          element_at(split(col("c_name"), "#"), 1).as("name_prefix"),
          element_at(split(col("c_name"), "#"), 2).as("name_id"))
        .orderBy(col("c_custkey")),
      Some("SELECT c_custkey, string_split(c_name, '#')[1] AS name_prefix, string_split(c_name, '#')[2] AS name_id FROM customer ORDER BY c_custkey")),

    // ---- J1: join on a two-column key (posts↔accounts on (author, token)) ----
    "j1_two_col_join" -> Q(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val g = li.groupBy(col("l_orderkey"), col("l_returnflag"))
          .agg(count(lit(1)).as("flag_lines"))
        li.filter(col("l_orderkey") < 200)
          .join(g, Seq("l_orderkey", "l_returnflag"), "left")
          .select("l_orderkey", "l_linenumber", "l_returnflag", "flag_lines")
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, g.flag_lines
        FROM lineitem l
        LEFT JOIN (SELECT l_orderkey, l_returnflag, count(*) AS flag_lines
                   FROM lineitem GROUP BY 1, 2) g
          ON l.l_orderkey = g.l_orderkey AND l.l_returnflag = g.l_returnflag
        WHERE l.l_orderkey < 200 ORDER BY l.l_orderkey, l.l_linenumber""")),

    // ---- J2: left join to metadata table (posts↔post_metadata) ----
    "j2_left_join" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
          .select(o("o_orderkey"), c("c_name"), c("c_mktsegment"))
          .orderBy(col("o_orderkey"))
      },
      Some("SELECT o_orderkey, c_name, c_mktsegment FROM orders LEFT JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),

    // ---- J3: inner join chain (dim snowflake) ----
    "j3_inner_chain" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(c("c_custkey"), n("n_name"), r("r_name"))
          .orderBy(col("c_custkey"))
      },
      Some("SELECT c_custkey, n_name, r_name FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey")),

    // ---- J4: semi-join (feed via follow list, engine/post_storage.py:338) ----
    "j4_semi_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
        c.join(big.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy(col("c_custkey"))
      },
      Some("SELECT c_custkey, c_name FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) ORDER BY c_custkey")),

    // ---- J5: anti-join (replies exclude own accounts, engine/post_storage.py:293) ----
    "j5_anti_join" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o95 = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        c.join(o95.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy(col("c_custkey"))
      },
      Some("SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate < TIMESTAMP '1996-01-01') ORDER BY c_custkey")),

    // ---- J6: top-N inner page re-joined for full rows (engine/post_storage.py:229-236) ----
    "j6_topn_rejoin" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val top = o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10).select(col("o_orderkey"))
        val li = Tables.lineitem(s, dir)
        li.join(broadcast(top), li("l_orderkey") === top("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10)
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- J7: scalar-subquery anchor (engine/post_storage.py:379-380) ----
    "j7_scalar_anchor" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        // the reference computes the anchor as a scalar first, then filters
        val anchor = o.filter(col("o_custkey") === 5)
          .agg(max(col("o_totalprice"))).first().getDouble(0)
        o.filter(col("o_custkey") <= 20 && col("o_totalprice") <= lit(anchor))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey <= 20 AND o_totalprice <= (SELECT max(o_totalprice) FROM orders WHERE o_custkey = 5)
        ORDER BY o_orderkey""")),

    // ---- J9 + A2: one-join vote attach replacing the reference's N+1 loop
    // (server/app.py:407-416) with sorted string_agg (engine/post_storage.py:338) ----
    "j9_votes_attach" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_orderkey") < 300)
        val li = Tables.lineitem(s, dir)
        val votes = li.groupBy(col("l_orderkey")).agg(
          count(lit(1)).as("n_votes"),
          micro(sum(d(col("l_quantity")))).as("sum_qty"),
          concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("voters"))
        o.join(votes, o("o_orderkey") === votes("l_orderkey"), "left")
          .select(o("o_orderkey"), col("n_votes"), col("sum_qty"), col("voters"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, v.n_votes, v.sum_qty, v.voters
        FROM orders LEFT JOIN (
          SELECT l_orderkey, count(*) AS n_votes,
                 cast(sum(cast(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty,
                 string_agg(cast(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS voters
          FROM lineitem GROUP BY 1) v ON o_orderkey = v.l_orderkey
        WHERE o_orderkey < 300 ORDER BY o_orderkey""")),

    // ---- A1: trending tags — explode + sum + top-k (engine/post_storage.py:403-405) ----
    "a1_trending_tags" -> Q(
      (s, dir) => Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("tag"), col("p_retailprice"))
        .groupBy(col("tag"))
        .agg(micro(sum(d(col("p_retailprice")))).as("payout"), count(lit(1)).as("n"))
        .orderBy(col("payout").desc, col("tag").asc)
        .limit(10),
      Some("""SELECT tag, cast(sum(cast(p_retailprice AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS payout, count(*) AS n
        FROM (SELECT unnest(string_split(p_name, ' ')) AS tag, p_retailprice FROM part)
        GROUP BY tag ORDER BY payout DESC, tag ASC LIMIT 10""")),

    // ---- A3: follower/following counts (engine/follow_storage.py:90-110) ----
    "a3_group_counts" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey")),
      Some("SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1 ORDER BY o_custkey")),

    // ---- A4: MAX/MIN scalar (engine/account_storage.py:57-63) ----
    "a4_scalar_extrema" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .agg(max(col("o_totalprice")).as("max_price"),
             min(col("o_orderdate")).as("min_date"),
             count(lit(1)).as("n")),
      Some("SELECT max(o_totalprice) AS max_price, min(o_orderdate) AS min_date, count(*) AS n FROM orders")),

    // ---- A5: min-by lookup (earliest reblog, engine/reblog_storage.py:39-56) ----
    "a5_earliest_per_key" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first_order"))
        .orderBy(col("o_custkey")),
      Some("SELECT o_custkey, min(o_orderdate) AS first_order FROM orders GROUP BY 1 ORDER BY o_custkey")),

    // ---- A7: event-sourced conditional sums (payout fold,
    // processors/engine_comments_contract_processor.py:116-214) ----
    "a7_conditional_sums" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          micro(sum(when(col("event_type") === "click", d(col("value"))).otherwise(d(lit(0))))).as("click_total"),
          micro(sum(when(col("event_type") === "view", d(col("value"))).otherwise(d(lit(0))))).as("view_total"),
          sum(when(col("event_type") === "error", lit(1)).otherwise(lit(0))).cast("long").as("n_errors"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
        cast(sum(CASE WHEN event_type = 'click' THEN cast(value AS DECIMAL(38,6)) ELSE cast(0 AS DECIMAL(38,6)) END) * 1000000 AS BIGINT) AS click_total,
        cast(sum(CASE WHEN event_type = 'view' THEN cast(value AS DECIMAL(38,6)) ELSE cast(0 AS DECIMAL(38,6)) END) * 1000000 AS BIGINT) AS view_total,
        cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        FROM events GROUP BY 1 ORDER BY user_id""")),

    // ---- A8/U2: set reconciliation via full outer join (engine/follow_storage.py:35-65) ----
    "a8_reconcile" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val a = o.filter(year(col("o_orderdate")) === 1995)
          .select(col("o_custkey")).distinct()
        val b = o.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey")).distinct()
        a.withColumn("in_95", lit(1))
          .join(b.withColumn("in_96", lit(1)), Seq("o_custkey"), "full_outer")
          .select(
            col("o_custkey"),
            coalesce(col("in_95"), lit(0)).as("in_95"),
            coalesce(col("in_96"), lit(0)).as("in_96"),
            when(coalesce(col("in_96"), lit(0)) === 1, 1).otherwise(0).as("state"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
        CASE WHEN a.o_custkey IS NULL THEN 0 ELSE 1 END AS in_95,
        CASE WHEN b.o_custkey IS NULL THEN 0 ELSE 1 END AS in_96,
        CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS state
        FROM (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995) a
        FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996) b
          ON a.o_custkey = b.o_custkey
        ORDER BY o_custkey""")),

    // ---- A9: children counters joined back to parents
    // (processors/comment_processor_for_engine.py:160-196) ----
    "a9_children_count" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_orderkey") < 1000)
        val cnt = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("children"))
        o.join(cnt, o("o_orderkey") === cnt("l_orderkey"), "left")
          .select(o("o_orderkey"),
            coalesce(col("children"), lit(0L)).as("children"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, cast(coalesce(c.children, 0) AS BIGINT) AS children
        FROM orders LEFT JOIN (SELECT l_orderkey, count(*) AS children FROM lineitem GROUP BY 1) c
          ON o_orderkey = c.l_orderkey
        WHERE o_orderkey < 1000 ORDER BY o_orderkey""")),

    // ---- A10: rollup (beyond-reference extension, Spark built-in) ----
    "a10_rollup" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(micro(sum(d(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, cast(sum(cast(l_quantity AS DECIMAL(38,6))) * 1000000 AS BIGINT) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- A11: exact distinct counts (approx_count_distinct is spec-tested
    // against this — HLL sketches can't hash-match a DuckDB oracle) ----
    "a11_count_distinct" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        count(DISTINCT l_partkey) AS n_part, count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ---- T9 streaming form: Spark's native session_window must agree with
    // the gaps-and-islands SQL formulation (full-precision timestamps) ----
    "t9b_session_window" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
        .select(col("user_id"), col("session_start"), col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH flagged AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
          FROM flagged)
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM sessions GROUP BY user_id, sid ORDER BY user_id, session_start""")),

    // ---- W4: keyset pagination by time (server/app.py:570-584) ----
    "w4_keyset_time" -> Q(
      (s, dir) => Keyset.pageDesc(
        Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_totalprice"),
        col("o_orderdate"), col("o_orderkey"),
        Some((lit("1999-01-01").cast("timestamp"), lit(0L))), 20),
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        WHERE o_orderdate < TIMESTAMP '1999-01-01'
           OR (o_orderdate = TIMESTAMP '1999-01-01' AND o_orderkey > 0)
        ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 20""")),

    // ---- W5: keyset pagination by score (engine/post_storage.py:376-401) ----
    "w5_keyset_score" -> Q(
      (s, dir) => Keyset.pageDesc(
        Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
        col("o_totalprice"), col("o_orderkey"),
        Some((lit(300000.0), lit(0L))), 20),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice < 300000.0 OR (o_totalprice = 300000.0 AND o_orderkey > 0)
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""")),

    // ---- W6: latest-wins per key — the core upsert primitive (S6/W6) ----
    "w6_latest_wins" -> Q(
      (s, dir) => Upsert.latestWins(
        Tables.events(s, dir), Seq("user_id"),
        Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "event_type", "value")
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1 ORDER BY user_id""")),

    // ---- W7: OFFSET emulation with cap (engine/account_history_storage.py:76-121) ----
    "w7_offset_page" -> Q(
      (s, dir) => Keyset.offsetPage(
        Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").asc), limit = 40, offset = 10),
      Some("SELECT event_id, ts, user_id, event_type FROM events ORDER BY ts DESC, event_id ASC LIMIT 40 OFFSET 10")),

    // ---- top-k feed (§2.6): ORDER BY score DESC LIMIT k ----
    "t1_topk_feed" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20")),

    // ---- U1: union + group (reblogged ∪ authored, engine/post_storage.py:230) ----
    "u1_union_group" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val authored = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_custkey"))
        val reblogged = o.filter(col("o_totalprice") > 300000)
          .select(col("o_orderkey"), col("o_custkey"))
        authored.unionByName(reblogged)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_src"), min(col("o_custkey")).as("custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, count(*) AS n_src, min(o_custkey) AS custkey FROM (
          SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'O'
          UNION ALL
          SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY 1 ORDER BY o_orderkey""")),

    // ---- U2: EXCEPT (set difference, engine/follow_storage.py:53-62) ----
    "u2_except" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val a = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        val b = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
        a.except(b).orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY o_custkey"""))
  )
}
