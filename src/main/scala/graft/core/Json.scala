package graft.core

/** Minimal JSON string escaping/unescaping shared by the service store
  * and the CLI transport (flat string-field objects only — the metadata
  * sidecars are deliberately not a general JSON document store). */
object Json {

  /** Escape to a double-quoted JSON string literal: backslash, quote,
    * and all control chars (so writer output is always valid JSON). */
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Parse a flat JSON object's string fields: {"k":"v", ...} ->
    * Map(k -> unescaped v). Non-string fields and nesting are ignored —
    * the service transports (meta sidecars, HTTP bodies) are flat
    * string-field objects by contract. */
  def parseFlat(s: String): Map[String, String] = {
    val re = """"(\w+)":\s*"((?:[^"\\]|\\.)*)"""".r
    re.findAllMatchIn(s)
      .map(m => m.group(1) -> unescape(m.group(2)))
      .toMap
  }

  /** Unescape the body of a JSON string literal in ONE left-to-right
    * pass — sequential String.replace calls corrupt inputs where one
    * replacement manufactures another's pattern (a literal backslash
    * followed by 'n' must stay "\\" + "n", never become a newline). */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case e => sb += e; i += 2 // covers \" \\ \/ and any passthrough
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
