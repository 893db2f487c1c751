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

  // ---------------------------------------------------------------
  // durable persistence: parallel write + crash-window recovery
  // ---------------------------------------------------------------

  private def withLedgerDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ss").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  private def bigLedger = spark.range(0, 200)
    .selectExpr("'card' AS kind", "concat('c', id) AS id",
      "concat('t', id) AS title", "cast(id as double) AS price")

  private def partFiles(path: String): Seq[java.io.File] = {
    val d = new java.io.File(path)
    if (!d.exists()) Nil
    else d.listFiles().toSeq.filter(_.getName.startsWith("part-"))
  }

  private def idsAt(path: String): Seq[String] = {
    val schema = bigLedger.schema
    StateStore.load(spark, path, schema)
      .select("id").collect().map(_.getString(0)).sorted.toSeq
  }

  test("save is a parallel multi-file write when bucketed by key " +
      "(the dir-level rename swap supplies atomicity, not a single file)") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      StateStore.save(bigLedger, path, bucketCols = Seq("kind", "id"),
        numBuckets = 4)
      assert(partFiles(path).size > 1,
        s"expected a multi-file ledger, got ${partFiles(path).map(_.getName)}")
      assert(idsAt(path) == bigLedger.select("id")
        .collect().map(_.getString(0)).sorted.toSeq)
    }
  }

  test("load recovers a crash between stage-out and commit: committed " +
      ".tmp-* rolls forward, .old-* and strays are swept") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      StateStore.save(bigLedger.limit(10), path, bucketCols = Seq("kind", "id"))
      // simulate save(v2) crashing after the tmp write + stage-out
      // renames but before the commit rename: dest is ABSENT, the v2
      // generation sits complete (with _SUCCESS) in .tmp-*, v1 in .old-*
      val v2 = bigLedger.filter($"id".isin("c100", "c101", "c102"))
      v2.write.parquet(s"$path.tmp-crash1")
      assert(new java.io.File(s"$path.tmp-crash1/_SUCCESS").exists())
      assert(new java.io.File(path).renameTo(new java.io.File(s"$path.old-crash1")))
      assert(!new java.io.File(path).exists())

      assert(idsAt(path) == Seq("c100", "c101", "c102")) // v2, NOT empty, NOT v1
      assert(new java.io.File(path).exists())
      assert(!new java.io.File(s"$path.tmp-crash1").exists())
      assert(!new java.io.File(s"$path.old-crash1").exists())
    }
  }

  test("load recovers a crash after stage-out with NO committed tmp: " +
      ".old-* rolls back instead of reading an empty first run") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      StateStore.save(bigLedger.limit(10), path, bucketCols = Seq("kind", "id"))
      val expected = idsAt(path)
      // dest staged out; the replacement tmp never finished (no _SUCCESS)
      assert(new java.io.File(path).renameTo(new java.io.File(s"$path.old-crash2")))
      val half = new java.io.File(s"$path.tmp-crash2")
      assert(half.mkdir())
      java.nio.file.Files.write(half.toPath.resolve("part-00000.parquet"),
        Array[Byte](1, 2, 3)) // torn write, never committed
      assert(idsAt(path) == expected)
      assert(!new java.io.File(s"$path.old-crash2").exists())
      assert(!new java.io.File(s"$path.tmp-crash2").exists())
    }
  }

  test("a committed tmp rolls forward even over an intact dest " +
      "(crash between tmp write and stage-out)") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      StateStore.save(bigLedger.limit(10), path, bucketCols = Seq("kind", "id"))
      val v2 = bigLedger.filter($"id".isin("c42"))
      v2.write.parquet(s"$path.tmp-crash3")
      assert(idsAt(path) == Seq("c42"))
      assert(!new java.io.File(s"$path.tmp-crash3").exists())
    }
  }

  test("mixed stamp formats: a stranded legacy hex-stamped generation " +
      "never outranks a wall-clock-stamped one (hex letters sort above digits)") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      // stale pre-upgrade generation, committed, with a random-hex stamp
      // whose leading letter lexicographically beats any digit
      bigLedger.filter($"id".isin("c7")).write.parquet(s"$path.tmp-fa1b2c3d")
      assert(new java.io.File(s"$path.tmp-fa1b2c3d/_SUCCESS").exists())
      // newer generation committed under the current millis-counter
      // format — EXACTLY nextStamp()'s \d{13}-\d{6} shape (a stray
      // extra digit would classify as legacy and this test would pass
      // through the mtime fallback instead of the format rank)
      bigLedger.filter($"id".isin("c150", "c151"))
        .write.parquet(s"$path.tmp-1755086400000-000001")
      // make the LEGACY dir the newer write by mtime, so only the
      // wall-clock-beats-legacy rank (not mtime order) can pick right
      val legacyDir = new java.io.File(s"$path.tmp-fa1b2c3d")
      val wallDir = new java.io.File(s"$path.tmp-1755086400000-000001")
      assert(legacyDir.setLastModified(wallDir.lastModified() + 10000))
      assert(idsAt(path) == Seq("c150", "c151"),
        "recovery preferred a stale legacy-stamped generation")
      assert(new java.io.File(dir).listFiles().map(_.getName).toSeq == Seq("ledger"))
    }
  }

  test("legacy-only stamps fall back to mtime order among themselves") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      bigLedger.filter($"id".isin("c1")).write.parquet(s"$path.tmp-deadbeef")
      bigLedger.filter($"id".isin("c2", "c3")).write.parquet(s"$path.tmp-0badcafe")
      // make the lexicographically SMALLER stamp the newer write
      val older = new java.io.File(s"$path.tmp-deadbeef")
      val newer = new java.io.File(s"$path.tmp-0badcafe")
      assert(older.setLastModified(newer.lastModified() - 10000))
      assert(idsAt(path) == Seq("c2", "c3"),
        "legacy recovery ordered by stamp string instead of mtime")
    }
  }

  test("save after an interrupted save recovers first, then commits " +
      "its own generation; load sees only the newest") {
    withLedgerDir { dir =>
      val path = s"$dir/ledger"
      StateStore.save(bigLedger.limit(10), path, bucketCols = Seq("kind", "id"))
      assert(new java.io.File(path).renameTo(new java.io.File(s"$path.old-crash4")))
      StateStore.save(bigLedger.limit(3), path, bucketCols = Seq("kind", "id"))
      assert(idsAt(path) == Seq("c0", "c1", "c2"))
      assert(new java.io.File(dir).listFiles().map(_.getName).toSeq == Seq("ledger"))
    }
  }
}
