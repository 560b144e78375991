package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.core.{ThreadTree, Upsert}

/** Batch replay of the Hive L1 op stream (comment / custom_json /
  * delete_comment — `stream_blocks.py:125-158`) into follows, reblogs, post
  * deletes, L1-maintained post fields, accounts activity, and post_metadata.
  */
object HiveOpsReplay {

  /** The reference double-decodes JSON payloads that arrive as JSON-encoded
    * strings (`processors/custom_json_processor.py:20-30`): if the payload
    * parses to a string, parse again. Detected here by a leading quote.
    */
  def doubleDecode(c: Column): Column =
    // a JSON-scalar-string payload: get_json_object('$') unescapes it
    when(c.startsWith("\""), get_json_object(c, "$")).otherwise(c)

  private def user(ops: DataFrame): Column =
    coalesce(get(col("posting_auths"), lit(0)), get(col("auths"), lit(0)))

  private def ap(author: Column, permlink: Column): Column =
    Schemas.authorperm(author, permlink)

  /** follows state from custom_json id="follow" ops
    * (`processors/custom_json_follow_processor.py:20-42`): shape-validated,
    * follower must equal the signing user, what=["ignore"] -> 2,
    * ["blog"] -> 1, else 0; names capped at 20 chars.
    */
  def followsState(hiveOps: DataFrame): DataFrame = {
    val f = hiveOps.filter(col("op_type") === "custom_json" && col("cj_id") === "follow")
      .withColumn("j", doubleDecode(col("cj_json")))
      .withColumn("kind", get_json_object(col("j"), "$[0]"))
      .withColumn("follower", get_json_object(col("j"), "$[1].follower"))
      .withColumn("following", get_json_object(col("j"), "$[1].following"))
      .withColumn("what", from_json(get_json_object(col("j"), "$[1].what"),
        ArrayType(StringType)))
      .withColumn("user", user(hiveOps))
      .filter(col("kind") === "follow" &&
        col("follower").isNotNull && col("following").isNotNull &&
        col("user") === col("follower") &&
        length(col("user")) <= 20 && length(col("following")) <= 20)
      .withColumn("state",
        when(col("what") === array(lit("ignore")), 2)
          .when(col("what") === array(lit("blog")), 1)
          .otherwise(0).cast("short"))
    Upsert.latestWins(f, Seq("follower", "following"), Seq(col("seq")))
      .select("follower", "following", "state")
  }

  /** reblogs state (`processors/custom_json_reblog_processor.py:20-44`):
    * ["reblog", {account, author, permlink[, delete]}], account must match the
    * signer, target must be an existing main post; "delete" tombstones.
    */
  def reblogsState(hiveOps: DataFrame, mainPosts: DataFrame): DataFrame = {
    val r = hiveOps.filter(col("op_type") === "custom_json" && col("cj_id") === "reblog")
      .withColumn("j", doubleDecode(col("cj_json")))
      .withColumn("kind", get_json_object(col("j"), "$[0]"))
      .withColumn("account", get_json_object(col("j"), "$[1].account"))
      .withColumn("r_author", get_json_object(col("j"), "$[1].author"))
      .withColumn("r_permlink", get_json_object(col("j"), "$[1].permlink"))
      .withColumn("del", get_json_object(col("j"), "$[1].delete") === "delete")
      .withColumn("user", user(hiveOps))
      .filter(col("kind") === "reblog" && col("account").isNotNull &&
        col("user") === col("account") &&
        col("r_author").isNotNull && col("r_permlink").isNotNull)
      .withColumn("authorperm", ap(col("r_author"), col("r_permlink")))
      .join(mainPosts.select(col("authorperm")).distinct(), Seq("authorperm"), "left_semi")
      .select(col("account"), col("authorperm"), col("ts"), col("seq"),
        when(col("del"), "delete").otherwise("upsert").as("op"))
    Upsert.compactLog(r, Seq("account", "authorperm"), "seq", "op")
      .select(col("account"), col("authorperm"), col("ts").as("timestamp"))
  }

  /** scot_set_tribe_settings (`processors/custom_json_set_tribe_settings
    * .py:18-47`): the token ISSUER may point promoted_post_account at a new
    * account; addressed by reward_pool_id, non-issuer ops ignored.
    * Returns (seq, token, promoted_post_account).
    */
  def tribeSettings(hiveOps: DataFrame, tokenCfg: DataFrame): DataFrame = {
    val t = hiveOps
      .filter(col("op_type") === "custom_json" &&
        col("cj_id") === "scot_set_tribe_settings")
      .withColumn("j", doubleDecode(col("cj_json")))
      .withColumn("rpid", expr("try_cast(get_json_object(j, '$.reward_pool_id') AS INT)"))
      .withColumn("ppa", get_json_object(col("j"), "$.promoted_post_account"))
      .withColumn("user", user(hiveOps))
      .filter(col("rpid").isNotNull && col("ppa").isNotNull)
    t.join(broadcast(tokenCfg.select(col("token"), col("reward_pool_id"), col("issuer"))),
        t("rpid") === col("reward_pool_id"), "inner")
      .filter(col("user") === col("issuer"))
      .select(col("seq"), col("token"), col("ppa").as("promoted_post_account"))
  }

  /** delete_comment tombstones: (seq, authorperm) for ContractReplay. */
  def deletes(hiveOps: DataFrame): DataFrame =
    hiveOps.filter(col("op_type") === "delete_comment")
      .select(col("seq"), ap(col("author"), col("permlink")).as("authorperm"))

  /** L1-maintained post fields from comment ops: title[:256], desc =
    * APPLIED body[:300], tags (category + metadata tags, deduped,
    * order-preserving), parent linkage, main_post — latest op per authorperm
    * (`processors/comment_processor_for_engine.py:32-150`).
    *
    * desc comes from the PATCH-FOLDED body (the reference truncates
    * `new_body` AFTER dmp.patch_apply, py:132) — truncating the raw latest
    * op body would serve diff-match-patch markup as the description
    * whenever the newest edit arrived as a patch.
    */
  def l1PostFields(hiveOps: DataFrame): DataFrame = {
    val c = commentOps(hiveOps)
    val bodies = PatchUdf.foldBodies(c)   // (authorperm, body) patch-applied
    Upsert.latestWins(c, Seq("authorperm"), Seq(col("seq")))
      .drop("body")
      .join(bodies, Seq("authorperm"), "left")
      .select(col("authorperm"),
        substring(col("title"), 1, 256).as("title"),
        substring(col("body"), 1, 300).as("desc"),
        col("tags"),
        col("parent_author"), col("parent_permlink"), col("main_post"),
        get_json_object(col("meta"), "$.app").as("app"))
  }

  private def commentOps(hiveOps: DataFrame): DataFrame =
    hiveOps.filter(col("op_type") === "comment")
      .withColumn("authorperm", ap(col("author"), col("permlink")))
      .withColumn("main_post",
        col("parent_permlink") === "" || col("parent_author") === "")
      .withColumn("meta", doubleDecode(col("json_metadata")))
      .withColumn("category",
        when(col("main_post") && col("parent_permlink") =!= "" &&
          !col("parent_permlink").contains(","), array(col("parent_permlink")))
          .otherwise(array().cast(ArrayType(StringType))))
      .withColumn("meta_tags",
        coalesce(from_json(get_json_object(col("meta"), "$.tags"),
          ArrayType(StringType)), array().cast(ArrayType(StringType))))
      .withColumn("tags",
        array_distinct(concat(col("category"),
          filter(col("meta_tags"), t => t.isNotNull))))

  /** accounts activity: last_post (replies) / last_root_post (main posts) per
    * author (`processors/comment_processor_for_engine.py:152-159`), plus the
    * sidechain mute flag merged in Replay.
    */
  def accountActivity(hiveOps: DataFrame): DataFrame =
    commentOps(hiveOps).groupBy(col("author").as("name"))
      .agg(
        max(when(!col("main_post"), col("ts"))).as("last_post"),
        max(when(col("main_post"), col("ts"))).as("last_root_post"))

  /** children counters: the reference increments the parent's counter on
    * every reply *op* (edits included) whose post exists
    * (`comment_processor_for_engine.py:160-173`) — so batch children =
    * count of reply ops per parent authorperm.
    */
  def childrenCounts(hiveOps: DataFrame, knownPosts: DataFrame): DataFrame =
    commentOps(hiveOps)
      .filter(!col("main_post"))
      .join(knownPosts.select(col("authorperm")).distinct(), Seq("authorperm"), "left_semi")
      .groupBy(ap(col("parent_author"), col("parent_permlink")).as("authorperm"))
      .agg(count(lit(1)).cast("int").as("children"))

  /** post_metadata: latest body/json per authorperm + tree-derived depth and
    * root-inherited url (`comment_processor_for_engine.py:174-201`).
    * Bodies arriving as diff-match-patch patches are applied in PatchUdf
    * (F9); a non-patch body is a full replacement.
    */
  def postMetadataState(spark: SparkSession, hiveOps: DataFrame,
                        children: DataFrame): DataFrame = {
    val c = commentOps(hiveOps)
    val latest = Upsert.latestWins(c, Seq("authorperm"), Seq(col("seq")))
      .withColumn("parent_authorperm",
        when(!col("main_post"), ap(col("parent_author"), col("parent_permlink"))))

    // body fold: apply the op sequence per post (patch or replace)
    val bodies = PatchUdf.foldBodies(c)

    // depth/url: BFS from main posts; root url = /{category}/{authorperm}
    val roots = latest.filter(col("main_post"))
      .select(col("authorperm").as("node"),
        concat(lit("/"), col("parent_permlink"), lit("/"), col("authorperm")).as("url"))
    val edges = latest.filter(!col("main_post"))
      .select(col("authorperm").as("child"), col("parent_authorperm").as("parent"))
    val lineage = ThreadTree.lineage(spark, edges, "child", "parent",
      roots.select(col("node")), "node", maxDepth = 8)
      .join(roots.withColumnRenamed("node", "root"), Seq("root"))
      .select(col("node").as("authorperm"), col("depth").cast("short").as("depth"),
        col("url"))

    latest
      .drop("body")                  // replaced by the patch-folded body
      .join(bodies, Seq("authorperm"), "left")
      .join(children, Seq("authorperm"), "left")
      .join(lineage, Seq("authorperm"), "left")
      .select(col("authorperm"), col("body"),
        col("meta").as("json_metadata"), col("tags"),
        coalesce(col("children"), lit(0)).as("children"),
        col("parent_authorperm"), col("url"), col("depth"))
  }
}
