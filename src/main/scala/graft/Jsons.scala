package graft

/** JSON string escaping shared by the driver-contract mains (Verify's
  * oracle/manifest dumps, Bench's one-line record): one escape table, so
  * the records the round driver parses cannot diverge in escaping behavior.
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or CR
  * in builder-authored SQL or an env-supplied path would otherwise make
  * the driver's json.load fail and silently zero the round's gate.
  */
private[graft] object Jsons {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
