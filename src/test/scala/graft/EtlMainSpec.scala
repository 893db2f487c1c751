package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.board.EtlMain
import graft.board.EtlMain.Fields
import graft.sinks.HttpSink.{HttpRequest, HttpResponse, Transport}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** End-to-end migration of the fixture board (etl.js:363-417 flow):
  * exact sink request log, ledger contents, and idempotent re-run. */
class EtlMainSpec extends SparkSpecBase {

  private val mapper = new ObjectMapper()

  private val fieldIds = Map(
    Fields.TrelloId -> "F_ID", Fields.TrelloType -> "F_TYPE",
    Fields.CardStatus -> "F_STATUS", Fields.CardType -> "F_CARDTYPE",
    Fields.Owner -> "F_OWNER", Fields.FallbackOwner -> "F_FALLBACK",
    Fields.Labels -> "F_LABELS", Fields.TaskType -> "F_TASKTYPE",
    Fields.TaskParent -> "F_PARENT", Fields.TaskParentLink -> "F_PARENTLINK",
    Fields.Dash -> "F_DASH", Fields.TaskAssignee -> "F_ASSIGNEE")

  /** GitHub-shaped scripted backend: serves the field dim, mints issue
    * numbers/node ids, answers both GraphQL mutations. */
  private class FakeGithub extends Transport {
    val log = mutable.Buffer.empty[HttpRequest]
    private var issueSeq = 0
    private var itemSeq = 0
    private val fieldsJson = {
      val opts = """{\"options\":[{\"id\":\"opt_pending\",\"name\":\"Pending\"},{\"id\":\"opt_done\",\"name\":\"Completed\"}]}"""
      val rows = fieldIds.values.toSeq.sorted.map { id =>
        if (id == "F_STATUS") s"""{"id":"$id","name":"$id","settings":"$opts"}"""
        else s"""{"id":"$id","name":"$id","settings":null}"""
      }
      rows.mkString("[", ",", "]")
    }
    def send(req: HttpRequest): HttpResponse = {
      log += req
      (req.method, req.url) match {
        case ("GET", "/project/fields") => HttpResponse(200, fieldsJson)
        case ("POST", "/repos/org1/repo1/issues") =>
          issueSeq += 1
          val title = mapper.readTree(req.body).at("/title").asText()
          HttpResponse(201,
            s"""{"number":$issueSeq,"node_id":"ISSUE$issueSeq","state":"open",""" +
              s""""title":${mapper.writeValueAsString(title)},""" +
              s""""html_url":"https://gh.example/org1/repo1/issues/$issueSeq"}""")
        case ("PATCH", url) if url.startsWith("/repos/org1/repo1/issues/") =>
          HttpResponse(200, s"""{"number":${url.split('/').last},"state":"open"}""")
        case ("POST", "/graphql") if req.body.contains("addProjectNextItem") =>
          itemSeq += 1
          HttpResponse(200,
            s"""{"data":{"addProjectNextItem":{"projectNextItem":{"id":"PITEM$itemSeq"}}}}""")
        case ("POST", "/graphql") if req.body.contains("updateProjectNextItemField") =>
          HttpResponse(200,
            """{"data":{"updateProjectNextItemField":{"projectNextItem":{"id":"x"}}}}""")
        case _ => HttpResponse(500, s"unexpected ${req.method} ${req.url}")
      }
    }
  }

  private def config = EtlMain.EtlConfig(
    owner = "org1", repo = "repo1", projectNodeId = "PROJ1",
    listStatusMap = Map("Concepts" -> "Pending", "Production" -> "Completed"),
    secondaryAdminFieldId = "cf1",
    fieldIds = fieldIds)

  private lazy val boardPath = getClass.getResource("/board.json").getPath

  test("fixture board migrates end-to-end with the reference's request set") {
    val gh = new FakeGithub
    val result = EtlMain.run(spark, boardPath, config, gh, sleeper = _ => ())

    val mutations = gh.log.filterNot(r => r.method == "GET")
    // 1 card create + 3 item creates (i1, i2, i4; i3 is complete and
    // never imported, c2 closed, c3 unmapped — exactly the reference's
    // skip set)
    val creates = mutations.filter(r =>
      r.method == "POST" && r.url == "/repos/org1/repo1/issues")
    assert(creates.size == 4)
    val cardCreate = mapper.readTree(creates.head.body)
    assert(cardCreate.at("/title").asText() == "Incubator on GitHub")
    assert(cardCreate.at("/body").asText().startsWith(
      "Imported from <https://trello.example/c/c1/184-incubator-on-github>."))
    assert(cardCreate.at("/assignees/0").asText() == "riongull")
    assert(cardCreate.at("/assignees/1").asText() == "samkirby22")

    // 4 project adds (1 card + 3 items)
    val adds = mutations.filter(_.body.contains("addProjectNextItem"))
    assert(adds.size == 4)
    assert(adds.head.body.contains(""""issueId":"ISSUE1""""))

    // card fields: 7 (id, type, status, card type, owner, fallback,
    // labels); item fields: i1 has 9, i2/i4 7 each (no Dash/assignee)
    val sets = mutations.filter(_.body.contains("updateProjectNextItemField"))
    assert(sets.size == 7 + 9 + 7 + 7)
    // single-select translation: the CardStatus write carries the
    // option id, never the human name (gh.js:439-452)
    val statusSet = sets.find(_.body.contains(""""fieldId":"F_STATUS"""")).get
    assert(statusSet.body.contains(""""value":"opt_pending""""))
    assert(!statusSet.body.contains("Pending"))
    // owner resolution (J7): riongull owner, samkirby22 fallback
    assert(sets.exists(s => s.body.contains(""""fieldId":"F_OWNER"""")
      && s.body.contains(""""value":"riongull"""")))
    assert(sets.exists(s => s.body.contains(""""fieldId":"F_FALLBACK"""")
      && s.body.contains(""""value":"samkirby22"""")))
    // bounty amount normalized through double (1.0000 -> "1.0")
    assert(sets.exists(s => s.body.contains(""""fieldId":"F_DASH"""")
      && s.body.contains(""""value":"1.0"""")))

    // markdown finalize: one PATCH whose body renders both checklist
    // sections with task checkboxes referencing the minted numbers
    val patches = mutations.filter(_.method == "PATCH")
    assert(patches.size == 1)
    val md = mapper.readTree(patches.head.body).at("/body").asText()
    assert(md.contains("## QA Tasks") && md.contains("## Specification Tasks"))
    assert(md.contains("- [ ] #"))

    // ledger state: card at M_LISTS, items at M_CREATED, every row has
    // a project item id
    val ledger = result.issueLedger
    assert(ledger.count() == 4)
    assert(ledger.filter(col("entity_kind") === "card")
      .select("migration").head().getInt(0) == graft.state.StateStore.MLists)
    assert(ledger.filter(col("project_item_id").isNull).count() == 0)
    assert(result.fieldLedger.count() == 7 + 9 + 7 + 7)
    assert(result.report.failed == 0)
    assert(result.report.sent == mutations.size)

    // ---- idempotence: re-running against the returned ledgers sends
    //      NOTHING (the reference's store.get guards, etl.js:41-59)
    val gh2 = new FakeGithub
    val again = EtlMain.run(spark, boardPath, config, gh2,
      issueLedger0 = Some(result.issueLedger),
      fieldLedger0 = Some(result.fieldLedger), sleeper = _ => ())
    assert(gh2.log.filterNot(_.method == "GET").isEmpty)
    assert(again.report.sent == 0)
    assert(again.issueLedger.count() == 4)
  }

  test("ledgers persist between batch runs: run → save → load → re-run sends nothing") {
    // the reference's db.json restart semantics (etl.js:14-19), on the
    // batch ledgers: a fresh process that loads the saved state must
    // classify every write as already-applied
    val dir = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val issuePath = s"$dir/issue_ledger"
    val fieldPath = s"$dir/field_ledger"
    try {
      // first run starts from ABSENT paths — load yields empty ledgers
      val issue0 = graft.state.StateStore.load(spark, issuePath, EtlMain.issueLedgerSchema)
      val field0 = graft.state.StateStore.load(spark, fieldPath, EtlMain.fieldLedgerSchema)
      assert(issue0.count() == 0 && field0.count() == 0)

      val gh = new FakeGithub
      val result = EtlMain.run(spark, boardPath, config, gh,
        issueLedger0 = Some(issue0), fieldLedger0 = Some(field0), sleeper = _ => ())
      assert(result.report.failed == 0)
      graft.state.StateStore.save(result.issueLedger, issuePath)
      graft.state.StateStore.save(result.fieldLedger, fieldPath)

      // "restart": reload from disk, re-run — zero mutations on the wire
      val issue1 = graft.state.StateStore.load(spark, issuePath, EtlMain.issueLedgerSchema)
      val field1 = graft.state.StateStore.load(spark, fieldPath, EtlMain.fieldLedgerSchema)
      assert(issue1.count() == 4)
      val gh2 = new FakeGithub
      val again = EtlMain.run(spark, boardPath, config, gh2,
        issueLedger0 = Some(issue1), fieldLedger0 = Some(field1), sleeper = _ => ())
      assert(gh2.log.filterNot(_.method == "GET").isEmpty)
      assert(again.report.sent == 0)

      // saving a ledger LOADED from the same path must not corrupt it
      // (the temp write fully materializes before the swap)
      val rowsBefore = issue1.collect().map(_.toString).sorted.toSeq
      graft.state.StateStore.save(again.issueLedger, issuePath)
      val issue2 = graft.state.StateStore.load(spark, issuePath, EtlMain.issueLedgerSchema)
      assert(issue2.count() == 4)
      assert(issue2.collect().map(_.toString).sorted.toSeq == rowsBefore)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("sendPhase streams a large multi-partition change set in key " +
      "order with exact ack alignment (first-run-migration shape)") {
    // A first-run migration's change set is corpus-sized; sendPhase
    // must not hold it whole on the driver. The memory CONTRACT is
    // structural — toLocalIterator fetches ONE partition of the
    // ordered frame at a time, sendEach retains nothing, and the
    // phase keeps only key tuples + parsed 2xx acks (id-sized) — so
    // this spec pins the two properties that contract rides on at a
    // deliberately multi-partition, fat-body scale: (1) requests
    // arrive in GLOBAL key order even though the input is scattered
    // across 32 unordered partitions (orderBy's range partitioning +
    // partition-at-a-time fetch compose to a global order), and
    // (2) the streamed key↔ack zip stays exact under interleaved
    // failures (non-2xx rows must drop out of the parsed set without
    // shifting later acks — the bug a positional zip would hide).
    import spark.implicits._
    val n = 20000
    val fat = "x" * 2048
    val reqs = spark.range(n)
      .select(
        format_string("e%07d", col("id")).as("entity_id"),
        lit("POST").as("method"),
        lit("/bulk").as("url"),
        concat(format_string("""{"k":"e%07d","pad":"""", col("id")), lit(fat), lit("\"}"))
          .as("body"))
      .repartition(32) // scatter: global order must come from sendPhase
    val seen = mutable.Buffer.empty[String]
    val transport = new Transport {
      def send(req: HttpRequest): HttpResponse = {
        val k = mapper.readTree(req.body).at("/k").asText()
        seen += k
        // deterministically fail ~1/7 of the rows — alignment must
        // survive holes in the ack stream
        if (k.drop(1).toInt % 7 == 3) HttpResponse(500, "boom")
        else HttpResponse(200, s"""{"ok":"$k"}""")
      }
    }
    val writer = new graft.sinks.HttpSink.RateLimitedWriter(
      transport, graft.sinks.HttpSink.RetryPolicy(), sleeper = _ => ())
    val (acks, report) = EtlMain.sendPhase(writer, reqs)
    // global send order = ascending entity_id, all rows exactly once
    assert(seen.size == n)
    assert(seen.toSeq == (0 until n).map(i => f"e$i%07d"))
    // acks: exactly the 2xx rows, each mapped to ITS OWN key
    assert(report.sent == seen.count(k => k.drop(1).toInt % 7 != 3))
    assert(report.failed == n - report.sent)
    assert(acks.size == report.sent)
    acks.foreach { case (keys, node) =>
      assert(keys.size == 1)
      assert(node.at("/ok").asText() == keys.head)
    }
  }

  test("missing configured field fails mustInit (gh.js:144-176 gate)") {
    val gh = new FakeGithub {
      override def send(req: HttpRequest): HttpResponse =
        if (req.url == "/project/fields")
          HttpResponse(200, """[{"id":"F_ID","name":"F_ID","settings":null}]""")
        else super.send(req)
    }
    val ex = intercept[IllegalStateException] {
      EtlMain.run(spark, boardPath, config, gh, sleeper = _ => ())
    }
    assert(ex.getMessage.contains("project field"))
  }
}
