package graft

/** Driver-contract hygiene: the properties the harness relies on but
  * nothing else would catch until a round's gate silently degraded. */
class ContractSpec extends SparkSpecBase {

  test("every oracle key names a query; names are unique and well-formed") {
    val qs = SparkEntry.allDefs.map(_.name)
    assert(qs.distinct.size == qs.size, "duplicate query names")
    assert(qs.forall(_.matches("q\\d+_[a-z0-9_]+")), qs.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    // bench JSON keys are the qNN prefixes — they must stay unique too
    val prefixes = qs.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size, "duplicate qNN prefix")
  }

  test("the battery is fully gated: every query has a DuckDB oracle") {
    // q66 (HLL) was the last rows-only query; since r14 it outputs
    // exact-twin counts plus oracle-asserted within-bound booleans, so
    // the estimate's contract is hash-gated too (magnitude still
    // pinned by ApproxQualitySpec). Nothing ships ungated.
    val unoracled = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name).sorted
    assert(unoracled.isEmpty, s"unexpected rows-only queries: $unoracled")
  }

  test("every oracle orders its rows (deterministic row order)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("testdata schemas match the pinned contract (drift names the column)") {
    // Round-11 incident: the driver regenerated events.parquet with ts as
    // TIMESTAMP(micros) instead of INT64 TIMESTAMP(NANOS) and 8 queries +
    // 9 suites went red with one opaque analysis error. This pin makes
    // the NEXT drift a single named diff.
    Tables.assertSchemas(spark, "/root/testdata/sf0.001")
  }

  test("events reader normalizes both physical ts encodings identically") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_enc")
    val micros = Tables.events(spark, "/root/testdata/sf0.001")
    // re-encode ts as epoch *nanos* in a plain int64 column — the exact
    // shape the nanosAsLong legacy path lands TIMESTAMP(NANOS) data in
    micros.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val viaNanos = Tables.events(spark, dir.toString)
    assert(viaNanos.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val a = micros.orderBy("event_id").collect()
    val b = viaNanos.orderBy("event_id").collect()
    assert(a.sameElements(b), "nanos-encoded ts must round-trip to identical rows")
  }

  test("releaseCaches frees localCheckpoint blocks (per-query sweep hygiene)") {
    // the battery's q36/q77/q118/q121 family materializes indexes via
    // localCheckpoint inside the query closure; Bench/Verify call
    // releaseCaches between queries, and those blocks MUST actually go,
    // or storage memory starves later queries across a 121-query sweep
    val df = spark.range(1000).toDF("id").localCheckpoint(true)
    df.count()
    val ids = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.nonEmpty, "localCheckpoint did not register a persistent RDD")
    SparkEntry.releaseCaches(spark)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.intersect(after).isEmpty,
      s"releaseCaches left localCheckpoint blocks behind: ${ids.intersect(after)}")
  }

  test("no oracle casts a decimal sum straight to double (1-ulp hazard)") {
    // DuckDB's decimal→double cast is off by 1 ulp past 2^53 unscaled;
    // the QueryDef rule is a VARCHAR round-trip — keep it machine-checked
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.replaceAll("\\s+", " ")
        .matches("(?s).*CAST\\(sum\\(CAST\\((?!.{0,200}?VARCHAR).*") &&
        sql.contains("DECIMAL") && !sql.contains("AS VARCHAR) AS DOUBLE") &&
        sql.replaceAll("\\s+", " ").contains("DECIMAL(18,4))) AS DOUBLE") => name
    }
    assert(offenders.isEmpty, s"raw decimal→double casts in: $offenders")
  }
}
