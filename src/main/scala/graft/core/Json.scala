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

  /** A request body that is not the contracted flat JSON object. The
    * HTTP layer maps this to 400 (client error), never 500. */
  final class Malformed(msg: String, at: Int)
    extends IllegalArgumentException(s"malformed JSON at offset $at: $msg")

  /** Parse a flat JSON object: {"k":"v","n":1,...} -> Map(k -> value
    * text, string values unescaped). The HTTP transport is flat
    * scalar-field objects BY CONTRACT, and this parser enforces it:
    * nested objects/arrays, unterminated strings, bad escapes, missing
    * separators, and trailing garbage all throw [[Malformed]] with the
    * offending offset — an untrusted body can produce a 400, never a
    * 500 or a silently misread field (the previous regex scan would
    * lift `"a":"b"` out of a NESTED object as if it were top-level).
    * Non-string scalars (numbers, booleans, null) are returned as their
    * literal text. */
  def parseFlat(s: String): Map[String, String] = {
    var i = 0
    def fail(msg: String): Nothing = throw new Malformed(msg, i)
    def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          if (i + 1 >= s.length) fail("truncated escape")
          s.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '"' | '\\' | '/' => sb += s.charAt(i + 1); i += 2
            case 'u' =>
              if (i + 6 > s.length) fail("truncated \\u escape")
              val hex = s.substring(i + 2, i + 6)
              // ASCII hex ONLY: Character.isDigit also accepts e.g.
              // Arabic-Indic digits, which parseInt(16) would tolerate
              if (!hex.forall(c => ('0' <= c && c <= '9') ||
                  ('a' <= c.toLower && c.toLower <= 'f')))
                fail(s"bad \\u escape '$hex'")
              sb += Integer.parseInt(hex, 16).toChar; i += 6
            case e => fail(s"unknown escape '\\$e'")
          }
        } else { sb += s.charAt(i); i += 1 }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      sb.toString
    }
    def scalar(): String = {
      ws()
      if (i >= s.length) fail("missing value")
      s.charAt(i) match {
        case '"' => string()
        case '{' | '[' => fail("nested objects/arrays not allowed " +
          "(flat scalar-field object contract)")
        case _ =>
          val start = i
          while (i < s.length && !",}".contains(s.charAt(i)) &&
            !s.charAt(i).isWhitespace) i += 1
          val lit = s.substring(start, i)
          val ok = lit == "true" || lit == "false" || lit == "null" ||
            lit.matches("""-?\d+(\.\d+)?([eE][+-]?\d+)?""")
          if (!ok) { i = start; fail(s"not a JSON scalar: '$lit'") }
          lit
      }
    }
    expect('{')
    val out = Map.newBuilder[String, String]
    ws()
    if (i < s.length && s.charAt(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = string()
        expect(':')
        out += k -> scalar()
        ws()
        if (i < s.length && s.charAt(i) == ',') { i += 1; ws() }
        else { expect('}'); more = false }
      }
    }
    ws()
    if (i < s.length) fail("trailing content after object")
    out.result()
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
