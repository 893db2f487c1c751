package graft

import graft.operators.ProductQuantization
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{functions => F, SparkSession}

/** Anatomy of one ANN-serve micro-batch: times each stage of the
  * packed PQ serving path separately at a target scale point, so a
  * throughput regression names its stage instead of guessing from the
  * end-to-end number (the r20 lesson: three plausible "fixes" moved
  * the sf1 batch < 20% because the cost was never where the narrative
  * said). Per-stage wall times go to stderr via a listener; stdout is
  * one JSON line.
  *
  * Usage: runMain graft.ServeProbe [sfDir] [nQueries] [reps] [outJson]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("target/sf1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(500)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val outJson = args.lift(3).getOrElse("SERVEPROBE.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dt = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
        if (dt > 200) {
          val rdds = si.rddInfos.map(_.name).filter(_ != null).distinct.mkString("|")
          val tm = si.taskMetrics
          System.err.println(f"    stage ${si.stageId}%4d ${dt}%6d ms tasks=${si.numTasks}%3d " +
            f"run=${tm.executorRunTime}%5d deser=${tm.executorDeserializeTime}%5d " +
            f"gc=${tm.jvmGCTime}%5d inRec=${tm.inputMetrics.recordsRead}%8d " +
            f"shRead=${tm.shuffleReadMetrics.recordsRead}%8d rdds=${rdds.take(90)}")
        }
      }
    })

    val t0 = System.nanoTime()
    val idx = ProductQuantization.buildIndex(spark, sf)
    val nCodes = idx.codesPacked.count()
    val buildS = (System.nanoTime() - t0) / 1e9

    val queries = Tables.embeddings(spark, sf)
      .select(F.col("vec_id"), F.col("embedding").cast("array<double>").as("emb"))
      .orderBy("vec_id").limit(nQueries)
    val gridded = ProductQuantization.applyGrid(queries, idx.stats)
      .select(F.col("vec_id").as("query_id"), F.col("qv")).localCheckpoint()

    import graft.functions.IntVectorFunctions._
    def bestOf(tag: String)(f: => Long): Double = {
      val times = (1 to reps).map { i =>
        val t = System.nanoTime(); val n = f
        val dt = (System.nanoTime() - t) / 1e9
        System.err.println(f"[serveprobe] $tag%-12s pass$i: $dt%6.2f s (rows=$n)")
        dt
      }
      times.min
    }
    // the serving-session confs (same pair AnnServeStream.start sets)
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val lut = gridded.crossJoin(F.broadcast(idx.cbAll))
      .select(F.col("query_id"),
        pq_lut(F.col("qv"), F.col("cball"), ProductQuantization.SubDim).as("lut"))
    val lutS = bestOf("lut")(lut.count())
    bestOf("lut_collect")(lut.collect().length.toLong)
    val adc = idx.codesPacked.crossJoin(F.broadcast(lut))
      .filter(F.col("vec_id") =!= F.col("query_id"))
      .select(F.col("query_id"), F.col("vec_id"),
        pq_adc(F.col("codes"), F.col("lut")).as("adc_dist"))
    val adcS = bestOf("adc_scan")(adc.count())
    val topkS = bestOf("adc_topk")(adc.groupBy("query_id")
      .agg(graft.functions.MinPairTopK.pair_topk(200, F.col("adc_dist"), F.col("vec_id")).as("t"))
      .count())
    val serveS = bestOf("full_serve")(
      ProductQuantization.serve(gridded, idx).count())
    if (sys.env.contains("SPARK_GRAFT_SERVE_EXPLAIN")) {
      val df = ProductQuantization.serve(gridded, idx)
      df.count()
      System.err.println(df.queryExecution.executedPlan.toString.take(8000))
    }
    val fmt = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val line = s"""{"probe":"serve","sf":"$sf","n_queries":$nQueries,"n_codes":$nCodes,""" +
      s""""build_s":${fmt(buildS)},"lut_s":${fmt(lutS)},"adc_scan_s":${fmt(adcS)},""" +
      s""""adc_topk_s":${fmt(topkS)},"full_serve_s":${fmt(serveS)}}"""
    val w = new java.io.PrintWriter(outJson, "UTF-8")
    try w.println(line) finally w.close()
    println("SERVEPROBE " + line)
    spark.stop()
  }
}
