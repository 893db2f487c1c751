package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Ad-hoc per-job/stage profiling: runMain graft.QProfile <name> [reps] */
object QProfile {
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
    val jobStart = TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStart(js.jobId) = (System.nanoTime(), desc.take(80))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dt = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
        System.err.println(f"    stage ${si.stageId}%4d ${dt}%6d ms  tasks=${si.numTasks}%3d  ${si.name.take(70)}")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobStart.remove(je.jobId).foreach { case (t0, desc) =>
          System.err.println(f"  job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $desc")
        }
      }
    })
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis: Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime)); t
    }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val n = fn(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
      println(f"QPROFILE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n gc=${gcMillis - gc0}ms")
      SparkEntry.releaseCaches(spark)
      System.gc()
    }
    spark.stop()
  }
}
