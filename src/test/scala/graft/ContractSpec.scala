package graft

/** Guards on the driver contract itself: name collisions would silently
  * drop queries from the Map, an oracle without a query never gets
  * checked, and entry() must smoke. */
class ContractSpec extends SparkTestBase {

  test("registry names are unique (Map must not swallow queries)") {
    val names = SparkEntry.registry.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key has a query; oracles are non-empty SQL") {
    val qk = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(qk.contains(k), s"oracle without query: $k")
      assert(sql.trim.toUpperCase.startsWith("SELECT") ||
        sql.trim.toUpperCase.startsWith("WITH"), s"odd oracle for $k")
    }
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name is declared in SURVEY.md §2") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val missing = SparkEntry.registry.map(_.name)
      .filterNot(n => survey.contains(s"`$n`"))
    assert(missing.isEmpty, s"not in SURVEY §2: ${missing.mkString(",")}")
  }
}
