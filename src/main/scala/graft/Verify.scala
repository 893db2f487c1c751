package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Schema pin: name the drifted column up front instead of letting N
    // queries fail with opaque analysis errors (round-11 incident). Warn
    // loudly but keep going — adaptive readers may still be green.
    Tables.schemaDrift(spark, sfDir).foreach { d =>
      System.err.println(s"[verify] TESTDATA SCHEMA DRIFT — $d")
    }
    new java.io.File(outDir).mkdirs()
    // Optional local-iteration filter (the driver never sets this).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    // a typo'd name silently verifying nothing wastes a whole iteration
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[verify] SPARK_GRAFT_ONLY names no such query: ${unknown.mkString(", ")}")
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      SparkEntry.releaseCaches(spark) // catalog cache + checkpoint blocks
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // effective index parameters (ADVICE r19): the ANN queries' graded
    // semantics move with these env-overridable vals — record what this
    // dump actually ran with (separate sidecar: oracle_sql.json must
    // stay a pure name→SQL map for the driver's DuckDB loop)
    locally {
      import graft.operators.SimilarityQueries._
      Files.writeString(Paths.get(s"$outDir/params.json"),
        s"""{"ann_params":{"lsh_tables":$LshTables,"lsh_planes":$LshPlanes,""" +
          s""""lsh_cap":$LshCandidateCap,"ivf_nprobe":$IvfNprobe,""" +
          s""""ivf_centroids":$IvfCentroids}}""")
    }
    spark.stop()
  }
}
