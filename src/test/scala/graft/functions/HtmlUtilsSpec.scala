package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the F1 HTML-strip semantics
  * (/root/reference/main.py:41-55,104-122). */
class HtmlUtilsSpec extends AnyFunSuite {

  /** Deterministic pseudo-random strings (tags, entities, whitespace, junk). */
  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val pieces = Seq("<p>", "</p>", "<b>", "tag", " ", "\n", "\t", "&amp;",
      "&bogus;", "text", "<", ">", "&", ";", "a", "日本", "<!--", "-->",
      "<script>", "</script>", "x=1;")
    (1 to n).map(_ => (1 to rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
  }

  test("basic tag stripping joins text nodes with spaces") {
    assert(HtmlUtils.clean("<p>Hello</p><p>World</p>") == "Hello World")
    assert(HtmlUtils.clean("<div>a<b>bold</b>c</div>") == "a bold c")
  }

  test("entities unescape before stripping") {
    assert(HtmlUtils.clean("Tom &amp; Jerry") == "Tom & Jerry")
    // reference quirk (main.py:112): unescape happens BEFORE parsing, so an
    // escaped "tag" becomes a real tag and is stripped
    assert(HtmlUtils.clean("&lt;b&gt;text&lt;/b&gt;") == "text")
    assert(HtmlUtils.clean("a&nbsp;b") == "a b")
    assert(HtmlUtils.clean("&#65;&#x42;") == "AB")
  }

  test("whitespace collapses to single spaces and trims") {
    assert(HtmlUtils.clean("  a \n\t b  ") == "a b")
    assert(HtmlUtils.clean("<p>\n  x\n  y\n</p>") == "x y")
  }

  test("script/style contents are dropped") {
    assert(HtmlUtils.clean("a<script>var x=1;</script>b") == "a b")
    assert(HtmlUtils.clean("a<style>.c{}</style>b") == "a b")
  }

  test("comments are skipped") {
    assert(HtmlUtils.clean("a<!-- hidden -->b") == "a b")
  }

  test("malformed html falls back to whitespace collapse (main.py:120-122)") {
    assert(HtmlUtils.clean("a < b and c") == "a < b and c")
    assert(HtmlUtils.clean("unclosed <tag") == "unclosed <tag")
  }

  test("null and empty behavior") {
    assert(HtmlUtils.clean(null) == null)
    assert(HtmlUtils.clean("") == "")
    assert(HtmlUtils.clean("<p></p>") == "")
  }

  test("unknown entities kept verbatim") {
    assert(HtmlUtils.clean("a &bogus; b") == "a &bogus; b")
  }

  test("property: clean is idempotent on tag-free output") {
    randomStrings(500).foreach { s =>
      val once = HtmlUtils.clean(s)
      // cleaned output may still contain '<'/'&' from malformed input;
      // cleaning fully tag-free output must be a fixpoint
      if (once != null && !once.contains('<') && !once.contains('&')) {
        assert(HtmlUtils.clean(once) == once, s"input: $s")
      }
    }
  }

  test("clean is NOT idempotent when output contains entities or angle brackets") {
    // unescape happens before stripping, so each application unescapes one
    // more layer — no optimizer may collapse clean(clean(x)) to clean(x)
    val doubleEscaped = "Tom &amp;amp; Jerry"
    assert(HtmlUtils.clean(doubleEscaped) == "Tom &amp; Jerry")
    assert(HtmlUtils.clean(HtmlUtils.clean(doubleEscaped)) == "Tom & Jerry")
    // a double-escaped tag materializes into a real tag after one pass and
    // is stripped by the second
    val escapedTag = "&amp;lt;b&amp;gt;bold&amp;lt;/b&amp;gt;"
    val once = HtmlUtils.clean(escapedTag)
    assert(once == "&lt;b&gt;bold&lt;/b&gt;")
    assert(HtmlUtils.clean(once) == "bold")
  }

  test("property: collapseWhitespace is a fixpoint") {
    randomStrings(500).foreach { s =>
      val once = HtmlUtils.collapseWhitespace(s)
      assert(HtmlUtils.collapseWhitespace(once) == once, s"input: $s")
    }
  }

  test("property: byte-level cleanUtf8 is equivalent to the String path") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // alphabet exercising every branch boundary: tags, entities (named,
    // decimal, hex, exotic non-ASCII-whitespace &#8232; -> fallback),
    // script/style (mixed case), comments, control bytes, non-ASCII text,
    // malformed fragments
    val pieces = Gen.oneOf(
      "<p>", "</p>", "<B>", "tag", " ", "  ", "\n", "\t", "", "",
      "&amp;", "&bogus;", "&#65;", "&#x42;", "&#8232;", "&nbsp;", "&copy;",
      "text", "<", ">", "&", ";", "#", "a", "é", "日本", "<!--", "-->",
      "<SCRIPT>", "</script>", "<style>", "</STYLE>", "x=1;", "< notag",
      "<weird attr='1'>", "&#xZZ;", "&#999999999;")
    val gen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, pieces).map(_.mkString))
    var seed = Seed(20260812L)
    (1 to 2000).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val fast = HtmlUtils.cleanUtf8(UTF8String.fromString(s))
      val slow = UTF8String.fromString(HtmlUtils.clean(s))
      assert(fast == slow, s"case $i diverged for input: ${s.replace("\n", "\\n")}")
    }
    assert(HtmlUtils.cleanUtf8(null) == null)
    // the zero-work triage: already-clean ASCII returns the SAME object
    val clean = UTF8String.fromString("already clean ascii text")
    assert(HtmlUtils.cleanUtf8(clean) eq clean)
  }
}
