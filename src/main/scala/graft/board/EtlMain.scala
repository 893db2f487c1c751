package graft.board

import com.fasterxml.jackson.databind.JsonNode
import graft.sinks.HttpSink.{HttpRequest, RateLimitedWriter, RetryPolicy, SinkReport, Transport}
import graft.sinks.RequestBuilders
import graft.sources.{ApiSource, ConfigValidation}
import graft.state.StateStore
import graft.transforms.TrelloTransforms
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The end-to-end migration pipeline — the reference's `main(board)`
  * (etl.js:363-417) composed from the engine's verified parts:
  *
  *   mustInit (field validation, gh.js:48-190)
  *   → normalize + derive (BoardPipeline ← transform.js:223-305)
  *   → card issue creates (etl.js:41-45)
  *   → project adds (etl.js:54-59)
  *   → custom-field change set + writes (etl.js:62-146)
  *   → item issue creates / title updates / closes (etl.js:173-226)
  *   → item project adds + field writes (etl.js:228-330)
  *   → markdown finalize + migration bump (etl.js:150-168)
  *
  * The reference walks card-by-card with awaits; the engine batches by
  * PHASE: each phase derives its (small) change set as a DataFrame —
  * desired state diffed against the ledger with
  * [[StateStore.changeSet]] — renders concrete request rows with
  * [[RequestBuilders]], and ships them through one rate-limited writer.
  * Same request set, idempotent like the reference (re-running sends
  * nothing once the ledger matches), but the expensive derivation stays
  * a parallel Spark plan and only the change set is serialized. Request
  * order inside a phase is deterministic (entity id, then field).
  *
  * Ledgers replace the reference's KV store (etl.js:14-19):
  *  - issue ledger: one row per created issue
  *    (entity_kind card|item ← ISSUE_TO_CARD/ISSUE_TO_ITEM, etl.js:9-10)
  *  - field ledger: one row per (entity, field) written value — the
  *    `meta:card:` / `:project` caches (etl.js:33-39, 224-232).
  */
object EtlMain {

  /** Logical field keys → the reference's env-var field config
    * (etl.js:69-145, 234-330). */
  object Fields {
    val TrelloId = "TrelloId"          // GITHUB_TRELLO_ID_FIELD
    val TrelloType = "TrelloType"      // GITHUB_TRELLO_TYPE_FIELD
    val CardStatus = "CardStatus"      // GITHUB_TRELLO_CARD_STATUS_FIELD
    val CardType = "CardType"          // GITHUB_TRELLO_CARD_TYPE_FIELD
    val Owner = "Owner"                // GITHUB_TRELLO_OWNER_FIELD
    val FallbackOwner = "FallbackOwner" // GITHUB_TRELLO_FALLBACK_OWNER_FIELD
    val Labels = "Labels"              // GITHUB_TRELLO_LABELS_FIELD
    val TaskType = "TaskType"          // GITHUB_TRELLO_TASK_TYPE_FIELD
    val TaskParent = "TaskParent"      // GITHUB_TRELLO_TASK_PARENT_FIELD
    val TaskParentLink = "TaskParentLink" // GITHUB_TRELLO_TASK_PARENT_LINK_FIELD
    val Dash = "Dash"                  // GITHUB_TRELLO_DASH_FIELD
    val TaskAssignee = "TaskAssignee"  // GITHUB_TRELLO_TASK_ASSIGNEE_FIELD
  }

  final case class EtlConfig(
      owner: String,
      repo: String,
      projectNodeId: String,
      listStatusMap: Map[String, String],
      secondaryAdminFieldId: String,
      fieldIds: Map[String, String],
      policy: RetryPolicy = RetryPolicy()) // etl.js:6 SLEEP=3000 pacing

  final case class EtlResult(
      issueLedger: DataFrame,
      fieldLedger: DataFrame,
      report: SinkReport)

  val issueLedgerSchema: StructType = StructType(Seq(
    StructField("entity_kind", StringType),
    StructField("entity_id", StringType),
    StructField("issue_number", LongType),
    StructField("issue_node_id", StringType),
    StructField("issue_state", StringType),
    StructField("issue_title", StringType),
    StructField("html_url", StringType),
    StructField("project_item_id", StringType),
    StructField("migration", IntegerType)))

  val fieldLedgerSchema: StructType = StructType(Seq(
    StructField("entity_id", StringType),
    StructField("field_id", StringType),
    StructField("value", StringType)))

  def emptyLedger(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], issueLedgerSchema)

  def emptyFieldLedger(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], fieldLedgerSchema)

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Ship request rows (keys…, method, url, body) ordered by the key
    * columns; returns (key values, parsed response) pairs for the 2xx
    * requests ONLY and the sink report — so callers can mark exactly
    * the acknowledged writes as applied and leave failed ones eligible
    * for retry on resume.
    *
    * Driver-memory bound: the ordered frame streams through
    * `toLocalIterator` (orderBy's range partitioning preserves global
    * key order across the partition-at-a-time fetch), so request
    * bodies — the corpus-sized part of a first-run migration's change
    * set — hold at most ONE partition on the driver at a time. What
    * the driver retains for the whole phase is the key tuples plus
    * the parsed 2xx response JSON (the ack payload callers fold into
    * the ledger) — O(change set) in COUNT but id-sized per row, not
    * body-sized. The reference holds the full serialized set either
    * way (etl.js builds its request list in memory); this keeps the
    * same per-key ack alignment without that ceiling. */
  private[graft] def sendPhase(
      writer: RateLimitedWriter,
      reqs: DataFrame,
      keyCols: Seq[String] = Seq("entity_id")): (Seq[(Seq[String], JsonNode)], SinkReport) = {
    val k = keyCols.length
    val rowIt = reqs.select((keyCols ++ Seq("method", "url", "body")).map(col): _*)
      .orderBy(keyCols.map(col): _*)
      .toLocalIterator()
    // keys are captured AS the request iterator drains (sendEach pulls
    // one row, sends, fires the callback, then pulls the next — a
    // streaming zip), so the positional alignment sendEach guarantees
    // (one callback per request, in input order, terminal rows for
    // exhausted retries) maps back to keys without re-materializing
    // the rows; request bodies are dropped the moment their response
    // lands
    var curKeys: Seq[String] = Seq.empty
    val reqIt = new Iterator[HttpRequest] {
      override def hasNext: Boolean = rowIt.hasNext
      override def next(): HttpRequest = {
        val r = rowIt.next()
        curKeys = (0 until k).map(r.getString)
        HttpRequest(r.getString(k), r.getString(k + 1), r.getString(k + 2))
      }
    }
    val parsed = Seq.newBuilder[(Seq[String], JsonNode)]
    val report = writer.sendEach(reqIt) { (_, resp) =>
      if (resp.status >= 200 && resp.status < 300)
        parsed += ((curKeys, mapper.readTree(resp.body)))
    }
    (parsed.result(), report)
  }

  def run(
      spark: SparkSession,
      boardPath: String,
      config: EtlConfig,
      transport: Transport,
      issueLedger0: Option[DataFrame] = None,
      fieldLedger0: Option[DataFrame] = None,
      sleeper: Long => Unit = Thread.sleep,
      fields0: Option[DataFrame] = None): EtlResult = {
    import spark.implicits._
    val writer = new RateLimitedWriter(transport, config.policy, sleeper)
    var totalSent = 0; var totalRetried = 0; var totalFailed = 0
    def track(r: SinkReport): Unit = {
      totalSent += r.sent; totalRetried += r.retried; totalFailed += r.failed
    }

    // ---- mustInit (S3/J10): configured field ids must exist remotely.
    //      `fields0` lets the caller supply the dim through the DSv2
    //      `graft-api` source (partition-per-page executor-side scan —
    //      EtlCli wires it when the endpoint is HTTP); the default
    //      stays the driver-side one-shot fetch, right for a
    //      page-capped dim read over an opaque Transport.
    val fields = fields0.getOrElse(ApiSource.fetchTable(spark, transport,
      "/project/fields", ApiSource.fieldSchema))
    ConfigValidation.requireAllPresent(
      config.fieldIds.values.toSeq.toDF("id"), fields.select("id"), "id",
      "project field")
    val options = ApiSource.fieldOptions(fields)

    // ---- normalize + derive
    val board = BoardPipeline.readBoard(spark, boardPath)
    val n = BoardPipeline.normalized(board)
    // localCheckpoint (not cache): cache keeps the whole nested-board
    // derivation inside every downstream phase's logical plan, and the
    // 8 phases × (change-set + ledger) queries each re-analyze that
    // tree — measured ~90 s of pure driver-side Catalyst/codegen per
    // run on the fixture board. The checkpoint truncates the plan to a
    // scan over the derived rows; phases analyze small trees.
    val cards = BoardPipeline.customizeCards(
      n, config.listStatusMap, config.secondaryAdminFieldId)
      .coalesce(1).localCheckpoint(true)
    val items = BoardPipeline.customizeItems(n)
      .coalesce(1).localCheckpoint(true)

    var ledger = issueLedger0.getOrElse(emptyLedger(spark))
    var fieldLedger = fieldLedger0.getOrElse(emptyFieldLedger(spark))

    def ledgerFor(kind: String): DataFrame =
      ledger.filter(col("entity_kind") === kind)

    // ---- phase: create missing issues for a desired frame
    //      (entity_id, title, issue_body, assignees)
    def createIssues(kind: String, desired: DataFrame): Unit = {
      val missing = desired.join(ledgerFor(kind), Seq("entity_id"), "left_anti")
      val (resps, report) = sendPhase(writer,
        RequestBuilders.createIssue(missing, config.owner, config.repo))
      track(report)
      if (resps.nonEmpty) {
        val created = resps.map { case (keys, j) =>
          val id = keys.head
          (kind, id, j.at("/number").asLong(), j.at("/node_id").asText(),
            j.at("/state").asText("open"), j.at("/title").asText(),
            j.at("/html_url").asText(), null: String, StateStore.MCreated)
        }.toDF(issueLedgerSchema.fieldNames.toIndexedSeq: _*)
        ledger = ledger.unionByName(created)
      }
    }

    // ---- phase: add ledger rows without a project item to the project
    def addToProject(kind: String): Unit = {
      val missing = ledgerFor(kind).filter(col("project_item_id").isNull)
        .select(col("entity_id"), col("issue_node_id"))
      val (resps, report) = sendPhase(writer,
        RequestBuilders.addProjectItem(missing, config.projectNodeId))
      track(report)
      if (resps.nonEmpty) {
        val itemIds = resps.map { case (keys, j) =>
          (keys.head, j.at("/data/addProjectNextItem/projectNextItem/id").asText())
        }.toDF("entity_id", "new_item_id")
        ledger = ledger.join(broadcast(itemIds), Seq("entity_id"), "left")
          .withColumn("project_item_id",
            coalesce(col("project_item_id"), col("new_item_id")))
          .drop("new_item_id")
          // lineage cut only when the ledger actually changed; the
          // ledger is change-set-sized so one partition keeps each
          // checkpoint a single-task job (the suite ran 4× faster)
          .coalesce(1).localCheckpoint(true)
      }
    }

    // ---- phase: write changed (entity, field, value) rows
    def setFields(kind: String, desired: DataFrame): Unit = {
      val changes = StateStore.changeSet(desired, fieldLedger,
        Seq("entity_id", "field_id"), Seq("value"))
      val withNode = changes
        .join(ledgerFor(kind).select(col("entity_id"),
          col("project_item_id").as("item_node_id")), Seq("entity_id"))
      val reqs = RequestBuilders.setFieldValue(withNode, options, config.projectNodeId)
      val (resps, report) = sendPhase(writer, reqs, Seq("entity_id", "field_id"))
      track(report)
      // record ONLY the writes the API acknowledged (2xx): a failed or
      // join-dropped row must stay out of the ledger so a resume
      // retries it instead of treating it as applied. A phase that
      // acknowledged nothing keeps the ledger untouched (no merge +
      // checkpoint job).
      if (resps.nonEmpty) {
        val acked = resps.map { case (keys, _) => (keys.head, keys(1)) }
          .toDF("entity_id", "field_id")
        fieldLedger = StateStore.merge(fieldLedger,
          changes.join(broadcast(acked), Seq("entity_id", "field_id"))
            .select("entity_id", "field_id", "value"),
          Seq("entity_id", "field_id")).coalesce(1).localCheckpoint(true)
      }
    }

    // ---- cards (etl.js:41-59: create, project-add)
    val cardDesired = cards.select(
      col("card_id").as("entity_id"),
      col("name").as("title"),
      TrelloTransforms.cardIssueBody(col("url"), col("desc")).as("issue_body"),
      col("member_usernames").as("assignees"))
    createIssues("card", cardDesired)
    addToProject("card")

    // ---- card fields (etl.js:62-146); conditional fields mirror the
    //      reference's truthiness guards (labels only when present)
    def f(key: String): String = config.fieldIds(key)
    val cardFields = Seq(
      cards.select(col("card_id").as("entity_id"), lit(f(Fields.TrelloId)).as("field_id"),
        col("card_id").as("value")),
      cards.select(col("card_id").as("entity_id"), lit(f(Fields.TrelloType)).as("field_id"),
        lit("Card").as("value")),
      cards.select(col("card_id").as("entity_id"), lit(f(Fields.CardStatus)).as("field_id"),
        col("card_status").as("value")),
      cards.select(col("card_id").as("entity_id"), lit(f(Fields.CardType)).as("field_id"),
        col("card_type").as("value")),
      cards.select(col("card_id").as("entity_id"), lit(f(Fields.Owner)).as("field_id"),
        col("owner").as("value")),
      cards.select(col("card_id").as("entity_id"), lit(f(Fields.FallbackOwner)).as("field_id"),
        col("fallback_owner").as("value")),
      // only when the card has real labels (etl.js:131-137 guards on
      // length; the "!Label" default-fill is presentation-only)
      cards.filter(element_at(col("label_names"), 1) =!= "!Label")
        .select(col("card_id").as("entity_id"), lit(f(Fields.Labels)).as("field_id"),
          element_at(col("label_names"), 1).as("value"))
    ).reduce(_ unionByName _)
    setFields("card", cardFields)

    // ---- items (etl.js:173-226): create, then title-drift updates,
    //      then close issues whose Trello item completed after import
    val itemDesired = items.select(
      col("item_id").as("entity_id"),
      col("title"),
      col("desc").as("issue_body"),
      when(col("assignee") === "!Assigned", array().cast("array<string>"))
        .otherwise(array(col("assignee"))).as("assignees"))
    createIssues("item", itemDesired)

    val titleDrift = itemDesired
      .join(ledgerFor("item").select(col("entity_id"), col("issue_number"),
        col("issue_title")), Seq("entity_id"))
      .filter(col("title") =!= col("issue_title"))
    val (driftResps, driftReport) = sendPhase(writer,
      RequestBuilders.updateIssue(
        titleDrift.select("entity_id", "issue_number", "title", "issue_body"),
        config.owner, config.repo))
    track(driftReport)
    if (driftResps.nonEmpty) {
      val acked = driftResps.map(_._1.head).toDF("entity_id")
      ledger = ledger
        .join(broadcast(titleDrift.join(acked, Seq("entity_id"))
          .select(col("entity_id"), col("title").as("__new_title"))),
          Seq("entity_id"), "left")
        .withColumn("issue_title", coalesce(col("__new_title"), col("issue_title")))
        .drop("__new_title").coalesce(1).localCheckpoint(true)
    }

    val toClose = n.checkItems.filter(col("state") === "complete")
      .select(col("id").as("entity_id"))
      .join(ledgerFor("item").filter(col("issue_state") === "open")
        .select(col("entity_id"), col("issue_number")), Seq("entity_id"))
      .withColumn("state", lit("closed"))
    val (closeResps, closeReport) = sendPhase(writer,
      RequestBuilders.updateIssue(toClose, config.owner, config.repo))
    track(closeReport)
    if (closeResps.nonEmpty) {
      val acked = closeResps.map(_._1.head).toDF("entity_id")
      ledger = ledger
        .join(broadcast(acked.withColumn("__closed", lit(true))),
          Seq("entity_id"), "left")
        .withColumn("issue_state",
          when(col("__closed"), lit("closed")).otherwise(col("issue_state")))
        .drop("__closed").coalesce(1).localCheckpoint(true)
    }

    addToProject("item")

    // ---- item fields (etl.js:234-330); parent fields join the card
    //      ledger for the parent issue url (card._issue, etl.js:52)
    val itemsWithCard = items
      .join(cards.select(col("card_id"), col("name").as("card_name"),
        col("owner").as("card_owner"), col("fallback_owner").as("card_fallback")),
        Seq("card_id"))
      .join(ledgerFor("card").select(col("entity_id").as("card_id"),
        col("html_url").as("card_issue_url")), Seq("card_id"), "left")
    def itemField(key: String, value: org.apache.spark.sql.Column,
        filtered: DataFrame = itemsWithCard): DataFrame =
      filtered.select(col("item_id").as("entity_id"),
        lit(f(key)).as("field_id"), value.as("value"))
    val itemFields = Seq(
      itemField(Fields.TrelloId, col("item_id")),
      itemField(Fields.TaskParent, col("card_name")),
      itemField(Fields.TaskParentLink, col("card_issue_url")),
      itemField(Fields.TrelloType, lit("Task")),
      itemField(Fields.TaskType, col("task_type")),
      itemField(Fields.Owner, col("card_owner")),
      itemField(Fields.FallbackOwner, col("card_fallback")),
      // numeric normalize then stringify (gh.js:487-494 parseFloat →
      // toString; Java renders 1.0 where JS renders 1 — documented)
      itemField(Fields.Dash, col("amount").cast("double").cast("string"),
        itemsWithCard.filter(col("amount").isNotNull)),
      itemField(Fields.TaskAssignee, col("assignee"),
        itemsWithCard.filter(col("assignee") =!= "!Assigned"))
    ).reduce(_ unionByName _)
    setFields("item", itemFields)

    // ---- markdown finalize (etl.js:150-168): cards still below M_LISTS
    //      get the full checklist-rendered body, then the bump
    val pending = ledgerFor("card").filter(col("migration") < StateStore.MLists)
      .select(col("entity_id"), col("issue_number"))
    val issueState = ledgerFor("item").select(col("entity_id").as("item_id"),
      col("issue_number"), col("issue_state"))
    val rendered = BoardPipeline.renderIssueMarkdown(cards, items, issueState)
      .select(col("card_id").as("entity_id"), col("body").as("issue_body"))
    val finalize = pending.join(rendered, Seq("entity_id"))
    val (mdResps, mdReport) = sendPhase(writer,
      RequestBuilders.updateIssue(finalize, config.owner, config.repo))
    track(mdReport)
    if (mdResps.nonEmpty) {
      val acked = mdResps.map(_._1.head).toDF("entity_id")
      ledger = ledger
        .join(broadcast(acked.withColumn("__bump", lit(true))),
          Seq("entity_id"), "left")
        .withColumn("migration",
          when(col("__bump"), greatest(col("migration"), lit(StateStore.MLists)))
            .otherwise(col("migration")))
        .drop("__bump").coalesce(1).localCheckpoint(true)
    }

    EtlResult(ledger, fieldLedger, SinkReport(totalSent, totalRetried, totalFailed))
  }
}
