package graft.engine

import java.net.URLDecoder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F9: diff-match-patch body reconstruction
  * (`processors/comment_processor_for_engine.py:100-130`).
  *
  * Comment edits on Hive may arrive as DMP patch text instead of a full body.
  * The reference parses with `patch_fromText` and applies onto the previous
  * body; parse failure or no previous body falls back to treating the payload
  * as the full body. This is inherently a *sequential per-key fold* — the one
  * write-path piece that cannot be a set-wise window — so the batch form
  * collects each post's op bodies in seq order (bounded: edits per post are
  * few) and folds them in a UDF; the streaming form keeps the current body in
  * keyed state.
  *
  * The applier implements the DMP patch text format (@@ -s,n +s,n @@ hunks,
  * URI-encoded ' '/'-'/'+' lines). Hunk placement follows `patch_apply` /
  * `match_main` semantics: exact at the stated offset, then exact search,
  * then the bitap fuzzy match (Wu–Manber shift-or with DMP's scoring:
  * Match_Threshold 0.5, Match_Distance 1000) so hunks whose context has
  * DRIFTED — earlier edits changed characters inside the context — still
  * place near their expected location. A hunk that cannot be placed is
  * skipped, mirroring patch_apply's per-hunk failure flags (which the
  * reference ignores).
  */
object PatchUdf {

  private val hunkHeader = """@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@""".r

  def looksLikePatch(s: String): Boolean =
    s != null && s.startsWith("@@ -")

  private def decode(s: String): String =
    try URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
    catch { case _: Exception => s }

  /** Apply DMP patch text to oldBody; unplaceable hunks are skipped. */
  def applyPatch(patchText: String, oldBody: String): String = {
    val lines = patchText.split("\n", -1)
    val sb = new StringBuilder
    var srcPos = 0              // consumed position in oldBody
    var i = 0
    try {
      while (i < lines.length) {
        lines(i) match {
          case hunkHeader(s1, _, _, _) =>
            var expectedOld = new StringBuilder
            var replacement = new StringBuilder
            i += 1
            while (i < lines.length && !lines(i).startsWith("@@")) {
              val l = lines(i)
              if (l.nonEmpty) {
                val text = decode(l.substring(1))
                l.charAt(0) match {
                  case ' ' => expectedOld ++= text; replacement ++= text
                  case '-' => expectedOld ++= text
                  case '+' => replacement ++= text
                  case _ => // ignore garbage line
                }
              }
              i += 1
            }
            val exp = expectedOld.toString
            // DMP prints start+1 for non-empty hunks
            val stated = math.max(0, s1.toInt - 1)
            // every placement path is monotone (>= srcPos): an earlier hunk
            // placed forward of its stated offset must not let a later
            // hunk's stated/exact position point BEHIND the consumed
            // prefix — substring(srcPos, pos) would throw and the catch
            // would replace the whole body with raw patch text
            val at = {
              val exact =
                if (stated >= srcPos &&
                    oldBody.regionMatches(stated, exp, 0, exp.length)) stated
                else oldBody.indexOf(exp, srcPos)
              if (exact >= 0) exact
              else matchBitap(oldBody, exp, stated) match {
                case loc if loc >= srcPos => loc   // fuzzy, monotone only
                case _ => -1
              }
            }
            if (exp.isEmpty || at >= 0) {
              val pos = if (exp.isEmpty)
                math.min(math.max(stated, srcPos), oldBody.length) else at
              sb ++= oldBody.substring(srcPos, pos)
              sb ++= replacement.toString
              srcPos = math.min(pos + exp.length, oldBody.length)
            } // else: hunk skipped
          case _ => i += 1
        }
      }
      sb ++= oldBody.substring(srcPos)
      sb.toString
    } catch {
      case _: Exception => patchText // parse failure -> payload is the body
    }
  }

  private val MatchThreshold = 0.5
  private val MatchDistance = 1000
  private val MaxBits = 64   // Long-width shift-or

  /** Locate the best fuzzy occurrence of `pattern` in `text` near `loc`, DMP
    * `match_bitap` semantics: Wu–Manber shift-or over error budgets, scored
    * by error rate plus proximity penalty; −1 when nothing scores under the
    * threshold. Patterns longer than the machine word locate by their first
    * 64 chars (DMP's patch_splitMax keeps hunks under Match_MaxBits for the
    * same reason).
    */
  private[engine] def matchBitap(text: String, fullPattern: String, loc: Int): Int = {
    val pattern = if (fullPattern.length > MaxBits) fullPattern.substring(0, MaxBits)
                  else fullPattern
    if (pattern.isEmpty) return -1
    val alphabet = new java.util.HashMap[Character, Long]()
    pattern.indices.foreach { i =>
      val c = pattern.charAt(i)
      alphabet.put(c, Option(alphabet.get(c)).getOrElse(0L) | (1L << (pattern.length - i - 1)))
    }
    def score(errors: Int, x: Int): Double =
      errors.toDouble / pattern.length + math.abs(loc - x).toDouble / MatchDistance

    var threshold = MatchThreshold
    val exactAhead = text.indexOf(pattern, loc)
    if (exactAhead != -1) {
      threshold = math.min(score(0, exactAhead), threshold)
      val exactBehind = text.lastIndexOf(pattern, loc + pattern.length)
      if (exactBehind != -1) threshold = math.min(score(0, exactBehind), threshold)
    }
    val matchMask = 1L << (pattern.length - 1)
    var bestLoc = -1
    var binMax = pattern.length + text.length
    var lastRd = Array.empty[Long]
    var d = 0
    var done = false
    while (d < pattern.length && !done) {
      // window that can still beat the current threshold at this error count
      var binMin = 0
      var binMid = binMax
      while (binMin < binMid) {
        if (score(d, loc + binMid) <= threshold) binMin = binMid else binMax = binMid
        binMid = (binMax - binMin) / 2 + binMin
      }
      binMax = binMid
      var start = math.max(1, loc - binMid + 1)
      val finish = math.min(loc + binMid, text.length) + pattern.length
      val rd = new Array[Long](finish + 2)
      rd(finish + 1) = (1L << d) - 1
      var j = finish
      while (j >= start) {
        val charMatch =
          if (j - 1 >= text.length) 0L
          else Option(alphabet.get(text.charAt(j - 1))).getOrElse(0L)
        rd(j) =
          if (d == 0) ((rd(j + 1) << 1) | 1L) & charMatch
          else (((rd(j + 1) << 1) | 1L) & charMatch) |
            (((lastRd(j + 1) | lastRd(j)) << 1) | 1L) | lastRd(j + 1)
        if ((rd(j) & matchMask) != 0) {
          val s = score(d, j - 1)
          if (s <= threshold) {
            threshold = s
            bestLoc = j - 1
            if (bestLoc > loc) start = math.max(1, 2 * loc - bestLoc)
            else j = start   // cannot improve further left of loc
          }
        }
        j -= 1
      }
      if (score(d + 1, loc) > threshold) done = true  // more errors can't win
      lastRd = rd
      d += 1
    }
    bestLoc
  }

  /** Fold a post's op bodies in seq order into the current body. */
  def foldBody(bodies: Seq[String]): String =
    bodies.foldLeft(null: String) { (state, b) =>
      if (b == null) state
      else if (looksLikePatch(b)) {
        if (state == null) b                 // reference falls back to payload
        else applyPatch(b, state)
      } else b
    }

  private val foldBodyUdf =
    udf((arr: Seq[org.apache.spark.sql.Row]) =>
      foldBody(arr.map(r => r.getString(1))))

  /** (authorperm, body) — current body per post after the edit fold.
    * Input must have (authorperm, seq, body).
    */
  def foldBodies(commentOps: DataFrame): DataFrame =
    commentOps.groupBy(col("authorperm"))
      .agg(sort_array(collect_list(struct(col("seq"), col("body")))).as("ops"))
      .select(col("authorperm"), foldBodyUdf(col("ops")).as("body"))
}
