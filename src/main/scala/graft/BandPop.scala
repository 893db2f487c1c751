package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-population audit: the distribution that decides whether the
  * rep-star cap ([[operators.DedupQueries.DefaultBandCap]]) is in its
  * tripping regime at a given scale point. Prints max population,
  * bands over the production cap (64) and over q203's fixture cap (4),
  * and the top of the distribution — the honest record of WHICH cap
  * regime a correctness artifact at that scale actually exercises.
  *
  * Usage: SPARK_GRAFT_CPUS=16 runMain graft.BandPop <sfDir>
  */
object BandPop {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bands = operators.DedupQueries.bandKeys(
      operators.DedupQueries.sigIndex(spark, d))
    val pops = bands.groupBy("band").count().cache()
    val row = pops.agg(
      max("count").as("max_pop"),
      sum(when(col("count") > operators.DedupQueries.DefaultBandCap, 1L)
        .otherwise(0L)).as("bands_over_cap64"),
      sum(when(col("count") > operators.DedupQueries.TrippingBandCap, 1L)
        .otherwise(0L)).as("bands_over_cap4"),
      count(lit(1)).as("n_bands")).collect()(0)
    println(s"BANDPOP dir=$d max_pop=${row.getLong(0)} " +
      s"over_cap64=${row.getLong(1)} over_cap4=${row.getLong(2)} " +
      s"n_bands=${row.getLong(3)}")
    println("BANDPOP top populations:")
    pops.orderBy(col("count").desc).limit(10).collect()
      .foreach(r => println(s"BANDPOP   pop=${r.getLong(1)}"))
    SparkEntry.releaseCaches(spark)
    spark.stop()
  }
}
