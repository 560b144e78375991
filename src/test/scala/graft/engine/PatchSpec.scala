package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** F9: DMP patch placement — exact, shifted (offsets moved by earlier
  * edits), and drifted (context characters changed) hunks, per
  * `patch_apply`/`match_main` semantics
  * (processors/comment_processor_for_engine.py:100-130).
  */
class PatchSpec extends AnyFunSuite {

  private val body = "the quick brown fox jumps over the lazy dog"
  // expected old region: "fox jumps over" at index 16 (DMP prints start+1)
  // line format: first char is the op, rest is content — context lines are
  // " fox " (content "fox ") and "  over" (content " over")
  private val patch = "@@ -17,14 +17,14 @@\n fox \n-jumps\n+leaps\n  over"

  test("exact placement at the stated offset") {
    assert(PatchUdf.applyPatch(patch, body) ==
      "the quick brown fox leaps over the lazy dog")
  }

  test("shifted context: an insert before the hunk moves the offset, the hunk still applies") {
    val shifted = "INSERTED TEXT! " + body
    assert(PatchUdf.applyPatch(patch, shifted) ==
      "INSERTED TEXT! the quick brown fox leaps over the lazy dog")
  }

  test("drifted context: a changed character inside the context still places via bitap") {
    val drifted = "the quick brown fox jumps ovar the lazy dog"
    assert(PatchUdf.applyPatch(patch, drifted) ==
      "the quick brown fox leaps over the lazy dog")
  }

  test("unplaceable hunk is skipped (patch_apply failure flag semantics)") {
    val unrelated = "completely different text with nothing in common at all ok"
    assert(PatchUdf.applyPatch(patch, unrelated) == unrelated)
  }

  test("bitap: exact occurrence wins, fuzzy occurrence found near loc, miss is -1") {
    assert(PatchUdf.matchBitap("abcdef", "cde", 0) == 2)
    assert(PatchUdf.matchBitap("abxdef", "abcdef", 0) == 0)   // 1 error of 6
    assert(PatchUdf.matchBitap("zzzzzz", "abcdef", 0) == -1)
  }

  test("out-of-order hunk placement stays monotone instead of clobbering the body") {
    // hunk 1's stated offset (6, 1-based) does not match, so it relocates
    // via indexOf to position 0, consuming the prefix; hunk 2's stated
    // offset (1) then points BEHIND the consumed position but its context
    // matches there exactly — placement must move FORWARD to the next
    // occurrence (position 4), not crash and fall back to raw patch text
    val body = "AB xAB y"
    val patch = "@@ -6,2 +6,2 @@\n-AB\n+ZZ\n@@ -1,2 +1,2 @@\n-AB\n+QQ\n"
    assert(PatchUdf.applyPatch(patch, body) == "ZZ xQQ y")
  }

  test("fold: a later patch whose offsets were shifted by an earlier edit applies") {
    // op1: full body; op2: prepend via full-body edit; op3: patch written
    // against the ORIGINAL offsets — placement must survive the shift
    val folded = PatchUdf.foldBody(Seq(
      body,
      "INSERTED TEXT! " + body,
      patch))
    assert(folded == "INSERTED TEXT! the quick brown fox leaps over the lazy dog")
  }
}
