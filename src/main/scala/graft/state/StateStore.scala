package graft.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style keyed state — the Spark-native replacement for the
  * reference's dom-storage/json-storage KV ledger (etl.js:14-19).
  *
  * Key families the reference stores (etl.js:9,10,33-39,183-190,224-232)
  * map to rows `(entity_kind, entity_id, payload, migration, field_cache)`:
  * `card:<id>`, `checkItem:<id>`, `meta:card:<id>`, ... become
  * (kind, id) pairs instead of string-concatenated keys, so the schema —
  * not call-site discipline — guarantees shape (the reference writes the
  * wrong value type at etl.js:117,127,140; a typed table cannot).
  *
  * All operations are pure DataFrame → DataFrame: change-set extraction
  * is a left join + value inequality filter (the reference's per-field
  * change detection, etl.js:113-146), application is anti-join + union.
  * At scale both shuffle once on the key; persist the state table
  * bucketed by the key to make the MERGE co-partitioned.
  */
object StateStore {

  /** Migration levels (etl.js:3-4): checkpoint phases of an entity. */
  val MCreated = 0
  val MLists = 1

  /** Rows of `desired` that are new or differ from `written` on any of
    * `valueCols` — the minimal sink write set (J9). Output columns:
    * key cols, valueCols (desired values), `change_type`.
    *
    * Comparison is null-safe (`NOT (a <=> b)`): a value transitioning
    * to or from NULL is a real update, where plain `=!=` would evaluate
    * to NULL and silently drop the row. Row existence in `written` is
    * detected with an explicit marker column, not null-ness of a value
    * column — a stored row whose first value is legitimately NULL must
    * classify as `update`, never `insert`. */
  def changeSet(
      desired: DataFrame,
      written: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val w = valueCols.foldLeft(written)((df, c) => df.withColumnRenamed(c, s"__w_$c"))
      .select((keyCols ++ valueCols.map(c => s"__w_$c")).map(col): _*)
      .withColumn("__w_exists", lit(true))
    val joined = desired.join(w, keyCols, "left")
    val anyMissing = col("__w_exists").isNull
    val anyDiff = valueCols
      .map(c => !(col(c) <=> col(s"__w_$c")))
      .reduce(_ || _)
    joined
      .filter(anyMissing || anyDiff)
      .withColumn("change_type", when(anyMissing, "insert").otherwise("update"))
      .select((keyCols ++ valueCols :+ "change_type").map(col): _*)
  }

  /** Apply a change set: changed/new rows replace, untouched rows kept. */
  def merge(state: DataFrame, changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val incoming = changes.select(state.columns.toIndexedSeq.map(col): _*)
    state.join(incoming, keyCols, "left_anti").unionByName(incoming)
  }

  /** Checkpoint bump (etl.js:164-165): raise migration level for keys. */
  def bumpMigration(state: DataFrame, keys: DataFrame, keyCols: Seq[String],
      level: Int): DataFrame = {
    val bumped = state.join(keys.select(keyCols.map(col): _*), keyCols, "left_semi")
      .withColumn("migration", greatest(col("migration"), lit(level)))
    state.join(keys.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(bumped)
  }
}
