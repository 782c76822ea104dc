package graft

/** Single JSON string-escape helper for the driver-parsed outputs
  * (Verify's oracle_sql.json, Bench's metric line). One implementation so
  * an escaping fix can never land in one emitter and not the other:
  * backslash, quote, and ALL control chars < 0x20 — a tab or CR in
  * builder-authored SQL or an exception message must never break the
  * driver's json.load. */
private[graft] object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def str(s: String): String = "\"" + escape(s) + "\""
}
