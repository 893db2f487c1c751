package graft

import graft.state.StateStore
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Durability state machine for the generation store: for ANY sequence
  * of saves, each interrupted at ANY point of the swap protocol, a
  * subsequent load returns exactly the last COMMITTED generation —
  * where "committed" means the parquet write finished (`_SUCCESS`), the
  * recover() roll-forward rule. Never an empty ledger, never a torn
  * one, and the directory is swept clean afterwards.
  */
object StateStoreProps extends Properties("state-store-durability") {

  private lazy val spark = SparkSpecBase.session

  private val schema = StructType(Seq(StructField("id", LongType, nullable = false)))

  /** Crash points of save()'s protocol, in step order. */
  sealed trait CrashPoint
  case object BeforeWrite extends CrashPoint // tmp never completes
  case object AfterWrite extends CrashPoint // tmp committed, no renames
  case object AfterStageOut extends CrashPoint // dest renamed aside, commit rename missed
  case object BeforeOldDelete extends CrashPoint // committed, stale .old-* remains
  case object Clean extends CrashPoint // the full, uninterrupted save

  private val opGen: Gen[CrashPoint] = Gen.oneOf(
    BeforeWrite, AfterWrite, AfterStageOut, BeforeOldDelete, Clean)

  private def write(ids: Seq[Long], dir: String): Unit = {
    import spark.implicits._
    ids.toDF("id").repartition(2).write.parquet(dir)
  }

  /** Re-enact save(generation k) interrupted at `crash`, mimicking the
    * exact rename protocol; returns the ids a reader SHOULD now see. */
  private def enact(path: String, gen: Int, crash: CrashPoint,
      committed: Option[Seq[Long]]): Option[Seq[Long]] = {
    val ids = (0L until 3L).map(_ + gen * 10L)
    val f = new java.io.File(path)
    crash match {
      case BeforeWrite =>
        // torn write: a tmp dir with junk and NO _SUCCESS
        val half = new java.io.File(s"$path.tmp-g$gen")
        assert(half.mkdir())
        java.nio.file.Files.write(half.toPath.resolve("part-00000.parquet"),
          Array[Byte](9, 9, 9))
        committed // nothing committed
      case AfterWrite =>
        write(ids, s"$path.tmp-g$gen")
        Some(ids) // _SUCCESS present: recover rolls FORWARD
      case AfterStageOut =>
        write(ids, s"$path.tmp-g$gen")
        if (f.exists()) assert(f.renameTo(new java.io.File(s"$path.old-g$gen")))
        Some(ids)
      case BeforeOldDelete =>
        write(ids, s"$path.tmp-g$gen")
        if (f.exists()) assert(f.renameTo(new java.io.File(s"$path.old-g$gen")))
        assert(new java.io.File(s"$path.tmp-g$gen").renameTo(f))
        Some(ids)
      case Clean =>
        import spark.implicits._
        StateStore.save(ids.toDF("id"), path, bucketCols = Seq("id"))
        Some(ids)
    }
  }

  property("load always returns the last committed generation and sweeps strays") =
    forAll(Gen.nonEmptyListOf(opGen).map(_.take(4))) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("graft-ssp").toString
      val path = s"$dir/ledger"
      try {
        var committed: Option[Seq[Long]] = None
        ops.zipWithIndex.forall { case (crash, gen) =>
          committed = enact(path, gen, crash, committed)
          val got = StateStore.load(spark, path, schema)
            .collect().map(_.getLong(0)).sorted.toSeq
          val want = committed.map(_.sorted).getOrElse(Seq.empty)
          // after load, recovery has settled dest and swept every stray
          val strays = new java.io.File(dir).listFiles()
            .map(_.getName).filterNot(_ == "ledger")
          got == want && strays.isEmpty
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)
}
