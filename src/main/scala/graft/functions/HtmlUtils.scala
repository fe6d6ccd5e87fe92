package graft.functions

import org.apache.spark.unsafe.types.UTF8String

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
            val lower = name.toLowerCase(java.util.Locale.ROOT)
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

  // ------------------------------------------------------------------
  // UTF8String fast path (VERDICT r2, next-round item 7).
  //
  // The corpus-dominant case is ASCII text, often already clean. The byte
  // path (a) returns the INPUT UTF8String untouched when a single scan
  // proves there is nothing to do (no tag, no entity, canonical spacing) —
  // zero allocation; (b) otherwise runs the same three passes over bytes,
  // skipping the UTF-8 decode/encode round-trip entirely. Any non-ASCII
  // input byte — or an entity expanding to a non-ASCII WHITESPACE char,
  // whose collapse semantics are char-level — falls back to the String
  // implementation, so the two paths are behaviorally identical (pinned by
  // a ScalaCheck equivalence spec).
  // ------------------------------------------------------------------

  /** ASCII bytes Java's Character.isWhitespace accepts: HT..CR, FS..US, SP. */
  @inline private def asciiWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d) || (b >= 0x1c && b <= 0x1f)

  @inline private def eqIgnoreCaseAscii(a: Byte, b: Byte): Boolean =
    a == b || {
      val al = if (a >= 'A' && a <= 'Z') (a + 32).toByte else a
      val bl = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      al == bl
    }

  private def regionMatchesIgnoreCase(s: Array[Byte], i: Int, pat: Array[Byte]): Boolean = {
    if (i + pat.length > s.length) return false
    var k = 0
    while (k < pat.length) {
      if (!eqIgnoreCaseAscii(s(i + k), pat(k))) return false
      k += 1
    }
    true
  }

  private def indexOfByte(s: Array[Byte], c: Byte, from: Int): Int = {
    var i = math.max(0, from)
    while (i < s.length) { if (s(i) == c) return i; i += 1 }
    -1
  }

  private def indexOfSeq(s: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    while (i + pat.length <= s.length) {
      var k = 0
      while (k < pat.length && s(i + k) == pat(k)) k += 1
      if (k == pat.length) return i
      i += 1
    }
    -1
  }

  /** Byte-level mirror of [[unescapeEntities]] for all-ASCII input. Returns
    * null when an entity expands to a non-ASCII whitespace char (the only
    * case where the byte passes would diverge) — caller takes the String
    * path. */
  private def unescapeAsciiBytes(s: Array[Byte]): Array[Byte] = {
    if (indexOfByte(s, '&', 0) < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '&') {
        var semi = -1
        var k = i + 1
        while (k < s.length && k - i <= 10 && semi < 0) {
          if (s(k) == ';') semi = k
          k += 1
        }
        if (semi > i) {
          val body = new String(s, i + 1, semi - i - 1, "US-ASCII")
          val repl: String =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            } else if (body.startsWith("#")) {
              try String.valueOf(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            } else namedEntities.getOrElse(body, null)
          if (repl != null) {
            if (repl.exists(ch => ch >= 0x80 && Character.isWhitespace(ch))) return null
            out.write(repl.getBytes("UTF-8"))
            i = semi + 1
          } else { out.write(c); i += 1 }
        } else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private val ScriptClose = "</script".getBytes("US-ASCII")
  private val StyleClose = "</style".getBytes("US-ASCII")
  private val CommentClose = "-->".getBytes("US-ASCII")

  /** Byte-level mirror of the tag scanner inside [[clean]]. Entity-produced
    * non-ASCII bytes pass through as text (UTF-8 continuation bytes can
    * never alias '<' or '&'). */
  private def stripTagsBytes(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    var skipUntil: Array[Byte] = null
    while (i < s.length) {
      val c = s(i)
      if (skipUntil != null) {
        if (c == '<' && regionMatchesIgnoreCase(s, i, skipUntil)) {
          val close = indexOfByte(s, '>', i)
          i = if (close < 0) s.length else close + 1
          skipUntil = null
        } else i += 1
      } else if (c == '<') {
        if (startsWithExact(s, i)) {
          val end = indexOfSeq(s, CommentClose, i + 4)
          i = if (end < 0) s.length else end + 3
          out.write(' ')
        } else {
          val close = indexOfByte(s, '>', i + 1)
          if (close < 0) { out.write(c); i += 1 }
          else {
            // mirror substring(i+1, close).trim.takeWhile(...): leading
            // trim removes bytes <= 0x20, the name stops at whitespace/'/'/'>'
            var p = i + 1
            while (p < close && (s(p) & 0xff) <= 0x20) p += 1
            val start = p
            while (p < close && !asciiWs(s(p)) && s(p) != '/' && s(p) != '>') p += 1
            if (isNameIgnoreCase(s, start, p, "script")) skipUntil = ScriptClose
            else if (isNameIgnoreCase(s, start, p, "style")) skipUntil = StyleClose
            out.write(' ')
            i = close + 1
          }
        }
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  /** The original code matches "<!--" case-SENSITIVELY (regionMatches
    * without the ignore-case flag) — mirror that exactly. */
  @inline private def startsWithExact(s: Array[Byte], i: Int): Boolean =
    i + 4 <= s.length && s(i) == '<' && s(i + 1) == '!' && s(i + 2) == '-' && s(i + 3) == '-'

  private def isNameIgnoreCase(s: Array[Byte], start: Int, end: Int, name: String): Boolean = {
    if (end - start != name.length) return false
    var k = 0
    while (k < name.length) {
      if (!eqIgnoreCaseAscii(s(start + k), name.charAt(k).toByte)) return false
      k += 1
    }
    true
  }

  /** Byte-level mirror of [[collapseWhitespace]]. Beyond ASCII whitespace,
    * the String path's predicate also swallows U+00A0 (its `c == ' '`
    * literal — the nbsp entity's expansion), so the UTF-8 pair C2 A0 is
    * whitespace here too. Other non-ASCII whitespace never reaches this
    * pass (unescapeAsciiBytes bails to the String path for those). */
  private def collapseWsBytes(s: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s(i)
      val isNbsp = c == 0xc2.toByte && i + 1 < s.length && s(i + 1) == 0xa0.toByte
      if (asciiWs(c) || isNbsp) {
        if (out.size > 0) pendingSpace = true
        i += (if (isNbsp) 2 else 1)
      } else {
        if (pendingSpace) { out.write(' '); pendingSpace = false }
        out.write(c)
        i += 1
      }
    }
    out.toByteArray
  }

  /** UTF8String-level clean: identical results to
    * `UTF8String.fromString(clean(u.toString))`, without the decode/encode
    * round-trip for ASCII input — and with ZERO work when the single
    * triage scan proves the text already clean (the corpus-dominant case). */
  def cleanUtf8(u: UTF8String): UTF8String = {
    if (u == null) return null
    val b = u.getBytes
    val n = b.length
    var i = 0
    var ascii = true
    var needsWork = false
    var prevSpace = false
    while (i < n) {
      val c = b(i)
      if (c < 0) { ascii = false; i = n }
      else {
        if (c == '<' || c == '&') needsWork = true
        if (asciiWs(c)) {
          if (c != 0x20 || prevSpace || i == 0 || i == n - 1) needsWork = true
          prevSpace = true
        } else prevSpace = false
        i += 1
      }
    }
    if (!ascii) return UTF8String.fromString(clean(u.toString))
    if (!needsWork) return u
    val un = unescapeAsciiBytes(b)
    if (un == null) return UTF8String.fromString(clean(u.toString))
    UTF8String.fromBytes(collapseWsBytes(stripTagsBytes(un)))
  }
}
