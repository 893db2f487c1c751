package graft

import graft.operators.ConnectedComponents
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import scala.annotation.tailrec

/** ScalaCheck property: the distributed min-label propagation must
  * agree with a brute-force union-find closure on arbitrary random
  * graphs — chains, stars, cycles, isolated pairs, whatever the
  * generator produces. The q77 oracle only exercises the LSH candidate
  * graph's shapes; this covers the operator as a component. */
object ConnectedComponentsProps extends Properties("connected-components") {

  private lazy val spark = SparkSpecBase.session

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 40) // node id space
    m <- Gen.chooseNum(1, 60) // edge count
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, n.toLong)
      b <- Gen.chooseNum(0L, n.toLong) if a != b
    } yield (a, b))
  } yield es

  /** Reference union-find with path compression. */
  private def closure(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    @tailrec def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { parent(x) = parent.getOrElse(p, p); find(p) }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  property("labels equal the union-find closure's min-id components") =
    forAll(edgesGen) { es =>
      es.nonEmpty ==> {
        import spark.implicits._
        val df = es.toDF("src", "dst")
        val got = ConnectedComponents.run(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == closure(es)
      }
    }

  property("a 200-link chain converges within the iteration budget") = {
    // diameter 200 ≫ maxIter 20: only pointer jumping (O(log d) rounds)
    // can close this — a plain neighbor walk silently caps out
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1)).toList
    val got = ConnectedComponents.run(chain.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got == (0L to 200L).map(_ -> 0L).toMap
  }

  property("an IntegerType edge frame works (internal long cast)") = {
    // the RDD loop reads getLong(0); without the explicit cast an
    // Int-typed caller would ClassCastException at runtime
    import spark.implicits._
    val df = List((1, 2), (2, 3), (7, 8)).toDF("src", "dst")
    val got = ConnectedComponents.run(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L)
  }

  // hub-heavy degree skew: a handful of hubs carry most of the edge
  // endpoints (the power-law shape LSH candidate graphs take when one
  // near-dup cluster dominates). The label exchange reduceByKeys on
  // node id, so a hub's thousands of messages map-side combine to one
  // record per partition before the shuffle — this pins that the skew
  // path stays correct (labels still equal the union-find closure)
  // through hubs ~100× the mean degree.
  private val powerLawGen: Gen[List[(Long, Long)]] = for {
    nHubs <- Gen.chooseNum(1, 3)
    spokes <- Gen.chooseNum(50, 300)
    // sub-hub bridges: connect some hubs so min-labels must propagate
    // THROUGH a high-degree node, not just terminate at one
    bridges <- Gen.listOfN(nHubs, Gen.chooseNum(0, nHubs - 1))
    tail <- Gen.listOfN(20, for {
      a <- Gen.chooseNum(10000L, 10040L)
      b <- Gen.chooseNum(10000L, 10040L) if a != b
    } yield (a, b))
  } yield {
    val hubEdges = for {
      h <- 0 until nHubs
      s <- 0 until spokes
    } yield (h.toLong, 100L + h * 1000L + s) // hub h -> its spokes
    val bridgeEdges = bridges.zipWithIndex.collect {
      case (to, from) if to != from => (from.toLong, to.toLong)
    }
    (hubEdges ++ bridgeEdges ++ tail).toList
  }

  property("hub-heavy power-law graphs: labels equal the closure") =
    forAll(powerLawGen) { es =>
      import spark.implicits._
      val got = ConnectedComponents.run(es.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == closure(es)
    }

  property("partitioner is sized to the graph, capped at the session width") =
    forAll(Gen.chooseNum(0L, 1L << 40), Gen.chooseNum(1, 4096)) { (m, cap) =>
      val p = ConnectedComponents.sizePartitions(m, cap)
      val want = ((m + (1L << 20) - 1) / (1L << 20)).toInt
      p >= 1 && p <= cap && (m <= (1L << 20) || p == math.min(cap, want))
    }

  // keep the suite fast: each case spins ~n Spark jobs
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)
}
