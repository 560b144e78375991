package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property tests (SURVEY.md §5.3): the set-wise batch operators must agree
  * with a straightforward sequential in-memory fold on randomized event logs
  * (fixed seeds — fully deterministic).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(k: String, op: String, a: Option[Double], b: Option[Long])

  private def randomLog(rnd: Random, n: Int): List[Ev] =
    List.fill(n) {
      val k = s"k${rnd.nextInt(3)}"
      if (rnd.nextInt(4) == 0) Ev(k, "delete", None, None)
      else Ev(k, "upsert",
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None,
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None)
    }

  /** the reference semantics, folded sequentially in memory */
  private def foldState(log: List[Ev]): Map[String, (Option[Double], Option[Long])] =
    log.foldLeft(Map.empty[String, (Option[Double], Option[Long])]) { (st, e) =>
      if (e.op == "delete") st - e.k
      else {
        val (ca, cb) = st.getOrElse(e.k, (None, None))
        st + (e.k -> (e.a.orElse(ca), e.b.orElse(cb)))
      }
    }

  test("compactLog == sequential upsert fold on 25 random logs") {
    val rnd = new Random(42)
    (1 to 25).foreach { _ =>
      val log = randomLog(rnd, 20)
      val df = log.zipWithIndex.map { case (e, i) =>
        (e.k, i.toLong, e.op,
          e.a.map(Double.box).orNull, e.b.map(Long.box).orNull)
      }.toDF("k", "seq", "op", "a", "b")
      val got = Upsert.compactLog(df, Seq("k"), "seq", "op")
        .collect()
        .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
      assert(got == foldState(log), s"log=$log")
    }
  }

  test("vote-delta closed form == sequential persisted fold (no reset: the " +
       "reference's authorReward zeroing is a dict-only dead store)") {
    val rnd = new Random(7)
    (1 to 50).foreach { _ =>
      val log = List.fill(25) {
        (s"v${rnd.nextInt(3)}", rnd.nextInt(150) - 50)
      }
      // sequential reference fold over PERSISTED state
      // (engine_comments_contract_processor.py:80-116): total += new - old
      var total = 0
      var cur = Map.empty[String, Int]
      log.foreach { case (v, rs) =>
        total += rs - cur.getOrElse(v, 0); cur += v -> rs
      }
      // closed form (ContractReplay): the fold telescopes to the last
      // rshares per voter
      val closed = log.groupBy(_._1).map { case (_, evs) => evs.last._2 }.sum
      assert(closed == total, s"log=$log")
    }
  }

  test("keyset pages concatenate to the full ordering (ties included)") {
    val rnd = new Random(13)
    (1 to 5).foreach { _ =>
      val scores = List.fill(30)(rnd.nextInt(10))   // heavy ties
      val df = scores.zipWithIndex
        .map { case (s, i) => (i.toLong, s.toDouble) }.toDF("id", "score")
      val full = df.orderBy(col("score").desc, col("id").asc)
        .collect().map(_.getLong(0)).toList
      var out = List.empty[Long]
      var anchor: Option[(Double, Long)] = None
      var continue = true
      while (continue) {
        val page = Keyset.pageDesc(df, col("score"), col("id"),
          anchor.map { case (s, i) => (lit(s), lit(i)) }, 7)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        if (page.isEmpty) continue = false
        else {
          out = out ++ page.map(_._1)
          anchor = Some((page.last._2, page.last._1))
        }
      }
      assert(out == full)
    }
  }
}
