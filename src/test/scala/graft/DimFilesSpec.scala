package graft

import graft.sources.DimFiles

/** File-based config dims (members.json / trello-fields.json). */
class DimFilesSpec extends SparkSpecBase {

  test("members.json loads as an (id, username) dimension + map") {
    val path = getClass.getResource("/members.json").getPath
    val dim = DimFiles.members(spark, path)
    val m = DimFiles.asMap(dim)
    assert(m == Map(
      "57e58ebcdb59d360ac33b82f" -> "riongull",
      "51ba022b569488283d000181" -> "coolaj86"))
    assert(dim.columns.toSeq == Seq("id", "username"))
  }

  test("trello-fields.json maps logical names to custom field ids") {
    val path = getClass.getResource("/trello-fields.json").getPath
    val m = DimFiles.asMap(DimFiles.trelloFields(spark, path))
    assert(m("secondaryAdmin") == "cf1")
    assert(m("bounty") == "cf2")
  }
}
