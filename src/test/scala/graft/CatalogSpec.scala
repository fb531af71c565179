package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-shape invariants: the count the docs cite, and the
  * queries/oracle key containment the driver's gate relies on. */
class CatalogSpec extends AnyFunSuite {

  test("catalog size matches the declared CatalogCount the docs cite") {
    assert(SparkEntry.queries.size == SparkEntry.CatalogCount,
      s"SparkEntry.queries has ${SparkEntry.queries.size} entries but " +
        s"CatalogCount says ${SparkEntry.CatalogCount} — update the " +
        "constant AND the counts quoted in SURVEY.md/COVERAGE.md/SCALING.md")
  }

  test("every oracle key (static and dynamic) names a catalog query") {
    val qs = SparkEntry.queries.keySet
    val staticOrphans = SparkEntry.oracleSql.keySet.diff(qs)
    val dynamicOrphans = SparkEntry.dynamicOracleSql.keySet.diff(qs)
    assert(staticOrphans.isEmpty, s"oracleSql keys without a query: $staticOrphans")
    assert(dynamicOrphans.isEmpty,
      s"dynamicOracleSql keys without a query: $dynamicOrphans")
  }

  test("no query carries both a static and a dynamic oracle") {
    val both = SparkEntry.oracleSql.keySet
      .intersect(SparkEntry.dynamicOracleSql.keySet)
    assert(both.isEmpty, s"double-oracled queries: $both")
  }
}
