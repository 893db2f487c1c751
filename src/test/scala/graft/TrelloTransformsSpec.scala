package graft

import graft.transforms.TrelloTransforms
import org.scalatest.funsuite.AnyFunSuite

/** Golden-pair tests ported from the reference's own suite
  * (tests/dash-parser-re.js:5-13) plus title-split / index-prefix /
  * owner-resolution fixtures (FIXTURES.md §B). */
class TrelloTransformsSpec extends AnyFunSuite {

  // reference goldens: input → extracted bounty amount
  private val bountyGoldens = Seq(
    "Some task (1.0 Dash)" -> Some("1.0"),
    "Some task (1 DASH)" -> Some("1"),
    "Some task (0.5 dash)" -> Some("0.5"),
    "Some task ( 0.5 Dash ))" -> Some("0.5"),
    "Some task ( 0.5Dash )." -> Some("0.5"),
    "Some task ( .5 Dash )   " -> Some(".5"),
    "Some (task) ( .5 Dash )   yo" -> Some(".5"),
    "Create :XcoinHeart: emoji image (0.1 Dash)" -> Some("0.1"),
    "No bounty here" -> None)

  test("bounty regex goldens (dash-parser-re.js)") {
    bountyGoldens.foreach { case (in, expected) =>
      assert(TrelloTransforms.parseChecklistItem(in).amount == expected,
        s"input: '$in'")
    }
  }

  test("index prefix strip (transform.js:18-23)") {
    assert(TrelloTransforms.stripIndexPrefix("1) do this") == "do this")
    assert(TrelloTransforms.stripIndexPrefix("  2)  do that") == "do that")
    assert(TrelloTransforms.stripIndexPrefix("b 3) do that") == "b 3) do that")
    assert(TrelloTransforms.stripIndexPrefix("4)do other") == "4)do other")
  }

  test("title/desc 50-char word fold (transform.js:43-59)") {
    val (t1, d1) = TrelloTransforms.splitTitleDesc("short name")
    assert(t1 == "short name" && d1 == "")

    val long = "Some long task name exceeding fifty characters so that it splits into title and description parts"
    val (t2, d2) = TrelloTransforms.splitTitleDesc(long)
    assert(t2 == "Some long task name exceeding fifty characters so...")
    assert(d2 == "that it splits into title and description parts")
  }

  test("full item parse: index + bounty + split + bounty re-append") {
    val p = TrelloTransforms.parseChecklistItem("1) Some task (1.0 Dash)")
    assert(p.title == "Some task")
    assert(p.desc == "Bounty: 1.0 Dash")
    assert(p.amount.contains("1.0"))

    val p2 = TrelloTransforms.parseChecklistItem(
      "Fix the thing that is broken in the longer pipeline of doom (2.5 Dash) with details")
    assert(p2.amount.contains("2.5"))
    assert(p2.desc.endsWith("\n\nBounty: 2.5 Dash"))
  }

  test("task type derivation (transform.js:294-295)") {
    assert(TrelloTransforms.taskType("Specification Tasks") == "Specification Task")
    assert(TrelloTransforms.taskType("QA Task") == "QA Task")
    assert(TrelloTransforms.taskType("Concept") == "Concept Task")
  }

  test("owner/fallback resolution (transform.js:331-385)") {
    val board = Seq("riongull", "samkirby22", "coolaj86")
    // fallback text excludes matching member from owner slot
    assert(TrelloTransforms.resolveOwners(Seq("riongull", "samkirby22"), Some("@samkirby"), board)
      == (Some("riongull"), Some("samkirby22")))
    // no fallback → first member is owner
    assert(TrelloTransforms.resolveOwners(Seq("samkirby22", "riongull"), None, board)
      == (Some("samkirby22"), None))
    // all members match fallback → no owner, fallback set
    assert(TrelloTransforms.resolveOwners(Seq("samkirby22"), Some("samkirby"), board)
      == (None, Some("samkirby22")))
    // fallback matches nobody on card but exact-matches the board dim
    assert(TrelloTransforms.resolveOwners(Seq("riongull"), Some("coolaj86"), board)
      == (Some("riongull"), Some("coolaj86")))
    // fallback typo: no member, no board match
    assert(TrelloTransforms.resolveOwners(Seq("riongull"), Some("ghost"), board)
      == (Some("riongull"), None))
    // no members at all
    assert(TrelloTransforms.resolveOwners(Seq.empty, None, board) == (None, None))
  }

  test("fuzzy member match (transform.js:189-211)") {
    val names = Seq("riongull", "samkirby22")
    assert(TrelloTransforms.fuzzyMemberMatch("samkirby", names).contains("samkirby22"))
    assert(TrelloTransforms.fuzzyMemberMatch("@SAMKIRBY", names).contains("samkirby22"))
    assert(TrelloTransforms.fuzzyMemberMatch("nobody", names).isEmpty)
    assert(TrelloTransforms.fuzzyMemberMatch("", names).isEmpty)
  }
}
