package graft.functions

/** HTML-to-text stripping with the reference's semantics
  * (/root/reference/main.py:41-55,104-122):
  *   - entity-unescape first,
  *   - parse tags, keep only text nodes, join them with " ",
  *   - collapse all whitespace runs to a single space, trim,
  *   - on malformed input fall back to whitespace-collapsing the raw string,
  *   - null/empty input stays empty (callers map "" -> NULL).
  *
  * Implemented as a single-pass scanner (no regex on the hot path) so the
  * Catalyst expression wrapping it stays cheap inside whole-stage codegen.
  */
object HtmlUtils {

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "rsquo" -> "’", "lsquo" -> "‘", "ldquo" -> "“",
    "rdquo" -> "”", "trade" -> "™", "deg" -> "°",
    "plusmn" -> "±", "frac12" -> "½", "times" -> "×",
    "divide" -> "÷", "euro" -> "€", "pound" -> "£",
    "cent" -> "¢", "yen" -> "¥", "sect" -> "§",
    "para" -> "¶", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»", "iexcl" -> "¡", "iquest" -> "¿",
    "szlig" -> "ß", "agrave" -> "à", "aacute" -> "á",
    "eacute" -> "é", "egrave" -> "è", "uuml" -> "ü",
    "ouml" -> "ö", "auml" -> "ä", "ntilde" -> "ñ")

  /** Unescape &name;, &#NNN; and &#xHH; entities. Unknown entities are kept
    * verbatim, matching Python html.unescape's permissiveness for junk. */
  def unescapeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val repl: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            } else if (body.startsWith("#")) {
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            } else namedEntities.getOrElse(body, null)
          if (repl != null) { sb.append(repl); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Collapse whitespace runs to single spaces and trim (main.py:116,122). */
  def collapseWhitespace(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == ' ') {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Strip tags, keeping text nodes joined by single spaces. Contents of
    * script/style elements are dropped (they are not "text" to a SAX handler
    * rendering data). Comments and CDATA are skipped. A lone '<' that never
    * closes is treated as text (malformed-HTML fallback, main.py:120-122). */
  def clean(input: String): String = {
    if (input == null) return null
    val s = unescapeEntities(input)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var skipUntil: String = null // "</script>" | "</style>" while inside one
    while (i < s.length) {
      val c = s.charAt(i)
      if (skipUntil != null) {
        if (c == '<' && s.regionMatches(true, i, skipUntil, 0, skipUntil.length)) {
          val close = s.indexOf('>', i)
          i = if (close < 0) s.length else close + 1
          skipUntil = null
        } else i += 1
      } else if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) s.length else end + 3
          sb.append(' ') // text on either side of a comment joins with " "
        } else {
          val close = s.indexOf('>', i + 1)
          if (close < 0) {
            // malformed: treat the remainder as text
            sb.append(c); i += 1
          } else {
            val tag = s.substring(i + 1, close).trim
            val name = tag.takeWhile(ch => !Character.isWhitespace(ch) && ch != '/' && ch != '>')
            val lower = name.toLowerCase
            if (lower == "script") skipUntil = "</script"
            else if (lower == "style") skipUntil = "</style"
            sb.append(' ') // text nodes on either side of a tag join with " "
            i = close + 1
          }
        }
      } else { sb.append(c); i += 1 }
    }
    collapseWhitespace(sb.toString)
  }
}
