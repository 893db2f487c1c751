package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timing: runMain graft.QBench <name> [reps] */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
      println(f"QBENCH $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      SparkEntry.releaseCaches(spark)
      // broadcasts (one per broadcast join, ~20/run in CC) are reaped by
      // the ContextCleaner only after their weak refs are GC'd — with a
      // huge heap that never happens on its own
      System.gc()
    }
    spark.stop()
  }
}
