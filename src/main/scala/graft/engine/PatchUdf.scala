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
  * URI-encoded ' '/'-'/'+' lines) with exact-at-offset matching plus a
  * whole-text search fallback — not the bitap fuzzy match of full DMP; a
  * hunk that cannot be placed is skipped, mirroring patch_apply's per-hunk
  * failure flags (which the reference ignores).
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
            val at =
              if (oldBody.regionMatches(stated, exp, 0, exp.length)) stated
              else oldBody.indexOf(exp, srcPos)
            if (exp.isEmpty || at >= 0) {
              val pos = if (exp.isEmpty) math.min(stated, oldBody.length) else at
              sb ++= oldBody.substring(srcPos, pos)
              sb ++= replacement.toString
              srcPos = pos + exp.length
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
