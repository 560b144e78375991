package graft.connector

import org.apache.spark.sql.Row

/** Seeded fuzz of the dir-granular filter overwrite (round-17): for random
  * dir layouts and random predicates, an overwrite must either
  *
  *   - SUCCEED with exactly Delta's REPLACE WHERE semantics — final state
  *     equals (old rows NOT matching the condition) plus the new rows — or
  *   - REFUSE loudly (an undecidable dir) leaving the table byte-identical.
  *
  * Silent over- or under-deletion is the failure mode the stats proofs
  * exist to prevent; this drives them across the predicate shapes
  * mustMatchAll/mayMatch handle (equality, null-safe equality via static
  * PARTITION specs, ranges, IN, conjunctions) and layouts from
  * fully-partition-aligned to mixed dirs.
  */
class FilterOverwriteFuzzSpec extends LakeSpec {
  protected def catalogName = "owfuzz"

  test("random layouts x random predicates: exact semantics or loud refusal") {
    sql("CREATE NAMESPACE IF NOT EXISTS owfuzz.db")
    val rnd = new scala.util.Random(1717)
    (1 to 20).foreach { round =>
      val t = s"owfuzz.db.t$round"
      sql(s"CREATE TABLE $t (k BIGINT, p BIGINT, v STRING)")
      // each INSERT = one dir; single-valued p dirs are decidable for
      // p-predicates, mixed dirs only for predicates their k/p ranges prove
      val nDirs = 1 + rnd.nextInt(4)
      var nextK = 0L
      (1 to nDirs).foreach { _ =>
        val rows = 1 + rnd.nextInt(20)
        val pVal =
          if (rnd.nextBoolean()) rnd.nextInt(3).toString            // aligned dir
          else s"id % ${1 + rnd.nextInt(3)}"                        // mixed dir
        sql(s"INSERT INTO $t SELECT id, $pVal, concat('v', id) " +
          s"FROM range($nextK, ${nextK + rows})")
        nextK += rows
      }
      val predicate = rnd.nextInt(5) match {
        case 0 => s"p = ${rnd.nextInt(3)}"
        case 1 => s"p < ${rnd.nextInt(3)}"
        case 2 => s"p IN (0, 2)"
        case 3 => s"k >= ${rnd.nextInt(nextK.toInt + 1)}"
        case _ => s"p = ${rnd.nextInt(3)} AND k < ${rnd.nextInt(nextK.toInt + 1)}"
      }
      val before = rows(s"SELECT k, p, v FROM $t ORDER BY k")
      val keptExpected = rows(s"SELECT k, p, v FROM $t WHERE NOT ($predicate) " +
        s"OR ($predicate) IS NULL ORDER BY k")
      val newRows = (0 until rnd.nextInt(3))
        .map(i => Row(100000L + round * 100 + i, 9L, s"new$i"))
      val insertSql = s"INSERT INTO $t REPLACE WHERE $predicate " +
        (if (newRows.isEmpty) "SELECT id, 9L, 'x' FROM range(0)"
         else newRows.map(r => s"SELECT ${r.getLong(0)}L, 9L, '${r.getString(2)}'")
           .mkString(" UNION ALL "))
      val outcome = try { sql(insertSql); None }
      catch { case e: Exception => Some(e) }
      outcome match {
        case None =>
          val after = rows(s"SELECT k, p, v FROM $t ORDER BY k")
          val expected = (keptExpected ++ newRows).sortBy(_.getLong(0))
          assert(after === expected,
            s"round $round predicate [$predicate]: overwrite diverged from " +
              s"REPLACE WHERE semantics\nbefore=$before")
        case Some(e) =>
          def msgs(x: Throwable): String =
            if (x == null) "" else Option(x.getMessage).getOrElse("") + msgs(x.getCause)
          assert(msgs(e).contains("PROVABLY"),
            s"round $round predicate [$predicate]: unexpected failure ${msgs(e)}")
          assert(rows(s"SELECT k, p, v FROM $t ORDER BY k") === before,
            s"round $round: a refused overwrite must not change the table")
      }
    }
  }
}
