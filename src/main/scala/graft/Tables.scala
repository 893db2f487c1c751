package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All reads go through [[Tables.load]] so every query gets the same
  * vectorized parquet scan; Catalyst prunes columns / pushes filters per
  * query. At 100 TB the same API holds — `dir` becomes an object-store
  * prefix and the scans keep partition pruning + predicate pushdown.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and convert to a
    * proper micro-precision TimestampType column (the generator's data
    * is micro-precision, so `div 1000` is exact). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      // integer `div`, NOT `/`: epoch nanos (~1.7e18) overflow double's
      // 53-bit exact integer range, so fp division is off by ±1 µs.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Decouple compute parallelism from input splits before CPU-heavy
    * per-row work (crypto hashing, shingle explosion, k-gram rolling
    * hashes). Parquet is splittable only at row-group boundaries, so a
    * compact file (one row group) feeds at most ONE task no matter how
    * many cores the cluster has — the test corpus's single-row-group
    * `documents.parquet` serialized the whole MinHash pipeline onto 1–2
    * of 32 cores. At 100 TB the same hazard appears as a few giant
    * row groups or heavily-compacted inputs: hash cost is O(bytes ×
    * hashes), orders of magnitude above the one narrow exchange of raw
    * text this adds, so the round-robin fan-out is the right trade at
    * every scale. Not applied to scan→filter→agg queries, where the
    * shuffle would cost more than it buys. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
