package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL normalization must never corrupt string literals. */
class NormalizeSpec extends AnyFunSuite {

  test("collapses whitespace outside literals, trims") {
    assert(SparkEntry.normalize("SELECT  a,\n   b\tFROM   t") == "SELECT a, b FROM t")
    assert(SparkEntry.normalize("  SELECT 1  ") == "SELECT 1")
  }

  test("preserves whitespace inside single-quoted literals") {
    assert(SparkEntry.normalize("SELECT 'a  b' FROM t") == "SELECT 'a  b' FROM t")
    assert(SparkEntry.normalize("SELECT 'tab\there'\n FROM t") == "SELECT 'tab\there' FROM t")
    assert(SparkEntry.normalize("SELECT regexp_replace(x, '\\s+  ', ' ')  FROM t")
      == "SELECT regexp_replace(x, '\\s+  ', ' ') FROM t")
  }

  test("handles doubled-quote escapes inside literals") {
    assert(SparkEntry.normalize("SELECT 'it''s  here',   2") == "SELECT 'it''s  here', 2")
  }

  test("every registered oracle SQL survives normalization unchanged in literals") {
    // whitespace-collapse outside literals only: re-normalizing is a fixpoint
    SparkEntry.oracleSql.values.foreach { s =>
      assert(SparkEntry.normalize(s) == s)
    }
  }
}
