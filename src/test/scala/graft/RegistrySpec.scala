package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: `SparkEntry.queries` is a Map, so a duplicate name
  * silently SHADOWS an earlier query — the verify gate then runs one query
  * fewer with no failure anywhere (found in round 4: a second
  * x_sample_weighted hid the Bernoulli sampler for two gate runs). */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across the whole registry") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query names shadow each other: $dups")
  }

  test("every oracle belongs to a registered query") {
    val names = SparkEntry.registry.map(_.name).toSet
    // ivfOracles are generated post-run for registered IVF queries; the
    // static sql entries must all match a registry row exactly.
    val orphans = SparkEntry.registry.flatMap(q => q.sql.map(_ => q.name))
      .filterNot(names.contains)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names follow the tiered naming scheme") {
    val pat = "^(s|p|j|a|g|u|o|w|r|e|f|x|st|sql|q)[0-9]*_?.*$".r
    val bad = SparkEntry.registry.map(_.name).filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"unexpected query names: $bad")
  }
}
