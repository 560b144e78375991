package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("asofJoin picks the latest right row at or before each left time") {
    val left = Seq(
      (1L, "u1", ts(10)), (2L, "u1", ts(20)), (3L, "u1", ts(25)),
      (4L, "u2", ts(5)),  (5L, "u3", ts(50)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts(10), 1.0),   // equal time: inclusive, matches event 1
      ("u1", ts(15), 2.0),   // latest for events 2 and 3
      ("u2", ts(6), 9.0))    // after u2's only event: no match
      .toDF("user_id", "p_ts", "p_value")
    val out = TemporalJoin.asofJoin(left, right, Seq("user_id"),
        "ts", "p_ts", Seq("p_value", "p_ts"))
      .select("event_id", "p_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> None, 5L -> None))
  }

  test("asofJoin == naive per-row max-by lookup on random data") {
    val rng = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, s"u${rng.nextInt(10)}", ts(rng.nextInt(1000).toLong)))
      .toDF("event_id", "user_id", "ts")
    // unique (user, time) right side by construction
    val right = (0 until 10).flatMap(u => rng.shuffle((1 to 1000).toList).take(40)
      .map(t => (s"u$u", ts(t.toLong), t * 1.5)))
      .toDF("user_id", "p_ts", "p_value")
    val got = TemporalJoin.asofJoin(left, right, Seq("user_id"),
        "ts", "p_ts", Seq("p_value"))
      .select("event_id", "p_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val rightRows = right.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val want = left.collect().map { r =>
      val (id, u, t) = (r.getLong(0), r.getString(1), r.getTimestamp(2))
      val prior = rightRows.filter(x => x._1 == u && !x._2.after(t))
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got == want)
  }

  test("rangeJoinBucketed == theta-filter equivalent, window edges honored") {
    val left = Seq((1L, "u1", ts(100)), (2L, "u1", ts(500)), (3L, "u2", ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts(100)),  // inclusive left edge → matches event 1
      ("u1", ts(159)),  // in window
      ("u1", ts(160)),  // exclusive right edge (window 60s) → no match
      ("u1", ts(505)), ("u2", ts(90)))
      .toDF("user_id", "c_ts")
    val out = TemporalJoin.rangeJoinBucketed(left, right, Seq("user_id"),
        "ts", "c_ts", windowMicros = 60L * 1000000)
      .select("event_id", "c_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000)).toSet
    assert(out == Set((1L, 100L), (1L, 159L), (2L, 505L)))
  }

  test("rangeJoinBucketed emits each matching pair exactly once") {
    val rng = new scala.util.Random(11)
    val left = (1 to 200).map(i =>
      (i.toLong, s"u${rng.nextInt(5)}", ts(rng.nextInt(500).toLong)))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 400).map(i =>
      (s"u${rng.nextInt(5)}", ts(rng.nextInt(500).toLong), i.toLong))
      .toDF("user_id", "c_ts", "click_id")
    val got = TemporalJoin.rangeJoinBucketed(left, right, Seq("user_id"),
        "ts", "c_ts", windowMicros = 45L * 1000000)
      .select("event_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    val want = left.as[(Long, String, Timestamp)].collect().flatMap { case (id, u, t) =>
      right.as[(String, Timestamp, Long)].collect().collect {
        case (ru, rt, cid)
          if ru == u && rt.getTime >= t.getTime && rt.getTime < t.getTime + 45000 =>
          (id, cid)
      }
    }.toList
    assert(got.size == got.distinct.size)
    assert(got.toSet == want.toSet)
  }
}
