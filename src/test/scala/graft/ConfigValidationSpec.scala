package graft

import graft.sources.ConfigValidation

/** J10/J11 validation semantics (gh.js mustInit + option lookup). */
class ConfigValidationSpec extends SparkSpecBase {
  import spark.implicits._

  private def fetched = Seq("Status", "Owner", "Bounty").toDF("name")

  test("missing = configured EXCEPT fetched") {
    val expected = Seq("Status", "Owner", "Ghost Field").toDF("name")
    val miss = ConfigValidation.missing(expected, fetched, "name")
      .collect().map(_.getString(0))
    assert(miss.toSeq == Seq("Ghost Field"))
  }

  test("requireAllPresent passes when complete, throws listing misses") {
    ConfigValidation.requireAllPresent(
      Seq("Status").toDF("name"), fetched, "name", "fields")
    val e = intercept[IllegalStateException] {
      ConfigValidation.requireAllPresent(
        Seq("Status", "Nope", "AlsoNope").toDF("name"), fetched, "name", "fields")
    }
    assert(e.getMessage.contains("Nope") && e.getMessage.contains("AlsoNope"))
  }

  test("resolveOptionId maps names and raises on miss from the executor") {
    val options = Seq(("Pending", "opt1"), ("Done", "opt2"))
      .toDF("option_name", "option_id")
    val ok = ConfigValidation.resolveOptionId(
      Seq("Pending", "Done").toDF("status"), "status", options)
      .orderBy("status").collect()
    assert(ok.map(_.getAs[String]("option_id")).toSeq == Seq("opt2", "opt1"))

    val bad = ConfigValidation.resolveOptionId(
      Seq("Pending", "Bogus").toDF("status"), "status", options)
    val e = intercept[Exception] { bad.collect() }
    assert(e.getClass.getSimpleName == "SparkRuntimeException")
    assert(e.getMessage.contains("Bogus"))
  }

  test("assertPresent column gate") {
    val good = Seq("complete", "incomplete").toDF("state")
      .select(ConfigValidation.assertPresent($"state", Seq("complete", "incomplete")))
    assert(good.count() == 2)
    val bad = Seq("completed").toDF("state")
      .select(ConfigValidation.assertPresent($"state", Seq("complete", "incomplete")))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getClass.getSimpleName == "SparkRuntimeException")
    assert(e.getMessage.contains("completed"))
  }
}
