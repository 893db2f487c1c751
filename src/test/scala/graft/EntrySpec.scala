package graft

/** Driver-contract smoke: the exact calls the driver makes. */
class EntrySpec extends SparkSpecBase {

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across operator batteries") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every query runs at sf0.001 and yields a readable schema") {
    SparkEntry.allDefs.foreach { qd =>
      val df = qd.fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, qd.name)
    }
  }
}
