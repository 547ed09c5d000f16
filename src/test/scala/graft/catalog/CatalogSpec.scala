package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  test("config lists split on the reference separators , ; newline") {
    assert(Catalog.splitList("a, b;c\nd") === Seq("a", "b", "c", "d"))
    assert(Catalog.splitList("") === Seq.empty)
  }

  test("exclusion regexes are anchored whole-name matches") {
    assert(Catalog.excluded("shadow_orders", Seq("shadow_.*")))
    assert(!Catalog.excluded("orders_shadow_x", Seq("shadow_.*")))
    assert(!Catalog.excluded("orders", Nil))
  }

  test("database election drops system DBs and exclusions, honors wildcard") {
    val discovered = Seq("nova", "glance", "mysql", "information_schema", "tmp_db")
    assert(Catalog.electDatabases(discovered, "*", Seq("tmp_.*")) ===
      Seq("nova", "glance"))
    assert(Catalog.electDatabases(discovered, "glance,nova", Nil) ===
      Seq("glance", "nova")) // include-list order preserved
    // explicit include cannot resurrect a system DB
    assert(Catalog.electDatabases(discovered, "mysql,nova", Nil) === Seq("nova"))
  }

  test("discovery lists parquet tables only, sorted") {
    val tables = Catalog.discoverTables("/root/testdata/sf0.001")
    assert(tables === tables.sorted)
    assert(tables.contains("orders") && tables.size === 10)
    assert(Catalog.discoverTables("/nonexistent") === Seq.empty)
  }
}
