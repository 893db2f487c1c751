package graft.board

import org.apache.spark.sql.types._

/** Explicit schema for the Trello board document (reference
  * README.md:250-421; FIXTURES.md §B). The reference loads the whole
  * JSON into heap (etl.js:420) — here it is a one-row DataFrame whose
  * nested arrays explode into normalized tables (SURVEY.md §1.3), so a
  * 100 TB corpus of boards is just more rows, not more heap.
  *
  * Every field nullable (the reference validates nothing and uses
  * optional chaining defensively, e.g. transform.js:344).
  */
object BoardModel {

  val customFieldValue: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("checked", StringType),
    StructField("number", StringType)))

  val customFieldItem: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("value", customFieldValue),
    StructField("idCustomField", StringType),
    StructField("idModel", StringType),
    StructField("modelType", StringType)))

  val label: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("idBoard", StringType),
    StructField("name", StringType),
    StructField("color", StringType)))

  val checkItem: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("idChecklist", StringType),
    StructField("state", StringType), // 'complete' | 'incomplete'
    StructField("name", StringType),
    StructField("pos", DoubleType),
    StructField("due", StringType),
    StructField("idMember", StringType)))

  val checklist: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("idCard", StringType),
    StructField("pos", DoubleType),
    StructField("idBoard", StringType),
    StructField("checkItems", ArrayType(checkItem))))

  val card: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("desc", StringType),
    StructField("url", StringType),
    StructField("closed", BooleanType),
    StructField("pos", DoubleType),
    StructField("idShort", LongType),
    StructField("idList", StringType),
    StructField("idBoard", StringType),
    StructField("idMembers", ArrayType(StringType)),
    StructField("idChecklists", ArrayType(StringType)),
    StructField("dateLastActivity", StringType),
    StructField("due", StringType),
    StructField("dueComplete", BooleanType),
    StructField("labels", ArrayType(label)),
    StructField("customFieldItems", ArrayType(customFieldItem)),
    // old-format boards nest checklists inside cards (transform.js:223-255)
    StructField("checklists", ArrayType(checklist))))

  val board: StructType = StructType(Seq(
    StructField("cards", ArrayType(card)),
    StructField("checklists", ArrayType(checklist)),
    StructField("lists", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("name", StringType))))),
    StructField("labels", ArrayType(label)),
    StructField("members", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("username", StringType),
      StructField("fullName", StringType))))),
    StructField("customFields", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))))))
}
