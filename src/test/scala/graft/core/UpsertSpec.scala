package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Latest-wins / upsert-log semantics (reference: upsert-by-PK everywhere,
  * deletes in engine/post_storage.py:407-413, sparse score-only updates in
  * engine_comments_contract_processor.py:107-115).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (String, Long, String, java.lang.Double, java.lang.Long)*) =
    rows.toDF("k", "seq", "op", "a", "b")

  private def state(rows: (String, Long, String, java.lang.Double, java.lang.Long)*) =
    Upsert.compactLog(log(rows: _*), Seq("k"), "seq", "op")
      .orderBy("k").collect().map(r =>
        (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toList

  test("latest full upsert wins") {
    assert(state(
      ("p1", 1, "upsert", 1.0, 10L),
      ("p1", 2, "upsert", 2.0, 20L)) == List(("p1", Some(2.0), Some(20L))))
  }

  test("sparse upsert merges per column, not per row") {
    // second upsert touches only column b — a must survive from seq 1
    assert(state(
      ("p1", 1, "upsert", 1.0, 10L),
      ("p1", 2, "upsert", null, 99L)) == List(("p1", Some(1.0), Some(99L))))
  }

  test("trailing delete removes the key") {
    assert(state(
      ("p1", 1, "upsert", 1.0, 10L),
      ("p1", 2, "delete", null, null)) == Nil)
  }

  test("delete resets: revived key does not see pre-delete columns") {
    assert(state(
      ("p1", 1, "upsert", 1.0, 10L),
      ("p1", 2, "delete", null, null),
      ("p1", 3, "upsert", null, 30L)) == List(("p1", None, Some(30L))))
  }

  test("keys are independent") {
    assert(state(
      ("p1", 1, "upsert", 1.0, 1L),
      ("p2", 2, "upsert", 2.0, 2L),
      ("p2", 3, "delete", null, null)) == List(("p1", Some(1.0), Some(1L))))
  }

  test("replay idempotence: applying the same log twice changes nothing") {
    val l1 = log(
      ("p1", 1, "upsert", 1.0, 10L),
      ("p1", 2, "upsert", null, 20L),
      ("p2", 3, "upsert", 3.0, 30L),
      ("p2", 4, "delete", null, null))
    val once = Upsert.compactLog(l1, Seq("k"), "seq", "op")
    // a replayed log = same rows again (same seq; latest-wins dedups them)
    val twice = Upsert.compactLog(l1.unionByName(l1), Seq("k"), "seq", "op")
    assert(once.orderBy("k").collect().toList ==
      twice.orderBy("k").collect().toList)
  }

  test("latestWins keeps exactly the newest row per key") {
    val df = Seq(("u1", 1L, "a"), ("u1", 3L, "c"), ("u1", 2L, "b"), ("u2", 1L, "x"))
      .toDF("k", "seq", "v")
    val got = Upsert.latestWins(df, Seq("k"), Seq(col("seq")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(2))).toList
    assert(got == List(("u1", "c"), ("u2", "x")))
  }
}
