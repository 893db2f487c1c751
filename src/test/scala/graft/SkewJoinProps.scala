package graft

import graft.operators.SkewJoins
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck property: the salted equi join must be result-identical
  * to the plain join on ARBITRARY skewed inputs and salt widths — the
  * fixed-fixture ScaleLayoutSpec case can't cover duplicate keys on
  * both sides, empty probe sides, or salt widths larger than the hot
  * key. The salt is pure physical-layout rewriting; any observable
  * difference is a correctness bug. */
object SkewJoinProps extends Properties("skew-joins") {

  private lazy val spark = SparkSpecBase.session

  // heavily skewed generator: most rows share one hot key
  private val rowsGen: Gen[(List[(Long, Long)], List[(Long, String)], Int)] = for {
    hot <- Gen.chooseNum(0L, 5L)
    nHot <- Gen.chooseNum(0, 40)
    nCold <- Gen.chooseNum(0, 15)
    left <- Gen.listOfN(nHot, Gen.chooseNum(0L, 1000L).map(v => (hot, v)))
    cold <- Gen.listOfN(nCold, for {
      k <- Gen.chooseNum(0L, 8L); v <- Gen.chooseNum(0L, 1000L)
    } yield (k, v))
    right <- Gen.listOfN(6, for {
      k <- Gen.chooseNum(0L, 8L); s <- Gen.alphaStr.map(_.take(4))
    } yield (k, s))
    buckets <- Gen.chooseNum(1, 8)
  } yield (left ++ cold, right, buckets)

  property("salted join equals the plain join on skewed random inputs") =
    forAll(rowsGen) { case (l, r, buckets) =>
      (l.nonEmpty && r.nonEmpty) ==> {
        import spark.implicits._
        val left = l.toDF("k", "v")
        val right = r.toDF("k2", "s")
        val plain = left.join(right, col("k") === col("k2"))
        val salted = SkewJoins.saltedEquiJoin(
          left, right, col("k"), col("k2"), Seq(col("k"), col("v")), buckets)
        // multiset equality both ways
        salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty
      }
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)
}
