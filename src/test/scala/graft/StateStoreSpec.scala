package graft

import graft.state.StateStore

/** MERGE semantics + upsert idempotence (SURVEY.md §5.3). */
class StateStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def desired = Seq(
    ("card", "c1", "title-a", 10.0),
    ("card", "c2", "title-b", 20.0),
    ("card", "c3", "title-c", 30.0)).toDF("kind", "id", "title", "price")

  private def written = Seq(
    ("card", "c1", "title-a", 10.0),   // unchanged
    ("card", "c2", "title-OLD", 20.0)) // differs
    .toDF("kind", "id", "title", "price")

  test("changeSet = inserts + updates, unchanged rows excluded") {
    val cs = StateStore.changeSet(desired, written,
      keyCols = Seq("kind", "id"), valueCols = Seq("title", "price"))
      .orderBy("id").collect()
    assert(cs.map(r => (r.getAs[String]("id"), r.getAs[String]("change_type"))).toSeq
      == Seq(("c2", "update"), ("c3", "insert")))
  }

  test("changeSet is null-safe: to-NULL and from-NULL transitions are updates, " +
      "a stored NULL first value is not an insert") {
    val d = Seq(
      ("card", "c1", Option.empty[String], Option(10.0)), // title -> NULL : update
      ("card", "c2", Option("t2"), Option(20.0)),         // title from NULL : update
      ("card", "c3", Option.empty[String], Option(30.0))) // stored title NULL, equal: no-op
      .toDF("kind", "id", "title", "price")
    val w = Seq(
      ("card", "c1", Option("t1"), Option(10.0)),
      ("card", "c2", Option.empty[String], Option(20.0)),
      ("card", "c3", Option.empty[String], Option(30.0)))
      .toDF("kind", "id", "title", "price")
    val cs = StateStore.changeSet(d, w, Seq("kind", "id"), Seq("title", "price"))
      .orderBy("id").collect()
    assert(cs.map(r => (r.getAs[String]("id"), r.getAs[String]("change_type"))).toSeq
      == Seq(("c1", "update"), ("c2", "update")))
  }

  test("merge applies the change set; second apply is a no-op (idempotent)") {
    val cs = StateStore.changeSet(desired, written, Seq("kind", "id"), Seq("title", "price"))
      .drop("change_type")
      .withColumn("migration", org.apache.spark.sql.functions.lit(0))
    val state0 = written.withColumn("migration", org.apache.spark.sql.functions.lit(0))
    val once = StateStore.merge(state0, cs, Seq("kind", "id"))
    val twice = StateStore.merge(once, cs, Seq("kind", "id"))
    assert(once.count() == 3)
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
    assert(once.filter($"id" === "c2").select("title").head().getString(0) == "title-b")
  }

  test("bumpMigration raises level only for selected keys, monotonic") {
    val state = written.withColumn("migration", org.apache.spark.sql.functions.lit(0))
    val keys = Seq(("card", "c1")).toDF("kind", "id")
    val bumped = StateStore.bumpMigration(state, keys, Seq("kind", "id"), StateStore.MLists)
    val byId = bumped.collect().map(r => r.getAs[String]("id") -> r.getAs[Int]("migration")).toMap
    assert(byId("c1") == 1 && byId("c2") == 0)
    // re-bump with a lower level must not regress
    val again = StateStore.bumpMigration(bumped, keys, Seq("kind", "id"), StateStore.MCreated)
    assert(again.filter($"id" === "c1").select("migration").head().getInt(0) == 1)
  }
}
