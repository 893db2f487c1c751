package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** File-based dimension loaders for the reference's hand-maintained
  * config files (lib/transform.js:8,10):
  *
  *  - `members.json`  — flat `{ trelloUserId: githubUsername }` object
  *    (README "members.json" section), the Trello→GitHub identity map
  *    consumed by mapCardToIssue's assignee translation
  *    (transform.js:78-84, 107-110);
  *  - `trello-fields.json` — flat `{ logicalName: customFieldId }`
  *    object (README "trello-fields.json"), e.g. `secondaryAdmin`,
  *    consumed by the fallback-owner extraction (transform.js:341-343).
  *
  * Both are inherently tiny driver-side config — loaded once, exposed
  * as a broadcastable two-column DataFrame AND a plain Map for the
  * connector tier. A flat JSON object is one row to `spark.read.json`,
  * so the object is parsed as a string→string map and exploded. */
object DimFiles {

  /** Flat JSON object file → (key, value) rows. */
  def readJsonObject(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(explode(from_json(col("value"), MapType(StringType, StringType)))
        .as(Seq("key", "value")))

  /** members.json → (id, username) dimension. */
  def members(spark: SparkSession, path: String): DataFrame =
    readJsonObject(spark, path)
      .select(col("key").as("id"), col("value").as("username"))

  /** trello-fields.json → (field_key, field_id) dimension. */
  def trelloFields(spark: SparkSession, path: String): DataFrame =
    readJsonObject(spark, path)
      .select(col("key").as("field_key"), col("value").as("field_id"))

  /** Driver-side map forms for connector config (e.g. wiring
    * `secondaryAdmin` into [[graft.board.EtlMain.EtlConfig]]). */
  def asMap(dim: DataFrame): Map[String, String] =
    dim.collect().map(r => r.getString(0) -> r.getString(1)).toMap
}
