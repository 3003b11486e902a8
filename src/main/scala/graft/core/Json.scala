package graft.core

/** The one JSON string escaper (driver-side, tiny strings): backslash,
  * quote, and every control character below 0x20. Shared by the bench line,
  * the verify dump, the commit metadata, and the DQ kwargs — three previous
  * hand-rolled copies had diverging control-character handling.
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `"escaped"` — the quoted JSON string literal form. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
