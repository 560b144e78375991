package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared JSON string escape ([[Jsons]]) feeds every record the round
  * driver parses (Verify's oracle/manifest dumps, Bench's one-line
  * record): check that strings round-trip through a real JSON parser
  * after quoting — the failure mode this guards is a path or SQL text
  * that silently invalidates a whole round's gate files.
  */
class JsonsSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def roundTrip(s: String): String =
    om.readTree(s"""{"k":${Jsons.quote(s)}}""").get("k").asText()

  test("seeded random strings round-trip through a real JSON parser") {
    val rnd = new scala.util.Random(20260815L)
    // alphabet biased toward the hazards: quotes, backslashes, every
    // control char, plus ordinary path/SQL characters and some non-ASCII
    val hazards = ('\u0000' to '\u001f') ++ Seq('"', '\\', '/', '\'')
    val plain = "abcXYZ019 _-./$%{}[]:,;=+()" + "äØ漢"
    val alphabet = (hazards ++ plain).toArray
    (1 to 500).foreach { _ =>
      val s = Array.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(roundTrip(s) === s, s"round-trip broke for: ${s.map(_.toInt)}")
    }
  }

  test("the documented hazards escape") {
    assert(roundTrip("""a"b\c""") === """a"b\c""")
    assert(roundTrip("tab\there\nnewline\rcr") === "tab\there\nnewline\rcr")
    assert(roundTrip("nul\u0000 bell\u0007") === "nul\u0000 bell\u0007")
    assert(Jsons.quote("""p"th""") === """"p\"th"""")
  }
}
