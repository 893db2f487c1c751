package graft

import graft.board.Reports
import graft.sources.ApiSource

/** The two console config reports (utils/get-member-info.js,
  * utils/get-github-project-fields.js) — exact line formats. */
class ReportsSpec extends SparkSpecBase {

  test("member info lines: padded members.json-ready rows") {
    import spark.implicits._
    val members = Seq(
      ("51ba022b569488283d000181", "coolaj86", "AJ ONeal"),
      ("m2", "samkirby22", "Sam Kirby"))
      .toDF("id", "username", "fullName")
    val lines = Reports.memberInfoLines(members)
    // reference sample (get-member-info.js:6): id, padded handle, name
    assert(lines.head ==
      """"51ba022b569488283d000181": "trello:coolaj86",             // AJ ONeal""")
    assert(lines(1) ==
      """"m2": "trello:samkirby22",           // Sam Kirby""")
  }

  test("field lines: id→name mapping rows") {
    val fields = ApiSource.parseJsonArray(spark,
      """[{"id":"F1","name":"Dash Bounty","settings":null},
         {"id":"F2","name":"Owner","settings":null}]""",
      ApiSource.fieldSchema)
    assert(Reports.fieldLines(fields) ==
      Seq(""""F1": "Dash Bounty"""", """"F2": "Owner""""))
  }
}
