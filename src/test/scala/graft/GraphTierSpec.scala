package graft

import graft.operators.{LabelPropagation, TriangleCount}
import org.apache.spark.sql.functions._

/** Pins the graph-tier primitives on crafted graphs where the expected
  * answer is hand-checkable: clamped label propagation's vote/tiebreak
  * semantics and order-independence, and the oriented triangle join's
  * exactly-once enumeration. */
class GraphTierSpec extends SparkSpecBase {

  test("propagate: seeded nodes clamp, majority wins, min-label tiebreak, order-free") {
    import spark.implicits._
    try {
      // path graph i0 - u1 - i3 - u2 - i6, plus u1 - i9.
      // Seeds (k%3=0): i0→c0, i3→c3 (3%4), i6→c2 (6%4), i9→c1.
      val pairs = Seq(("u1", "i0"), ("u1", "i3"), ("u1", "i9"),
        ("u2", "i3"), ("u2", "i6"))
      val ed = pairs.toDF("u", "i")
        .select(col("u").as("src"), col("i").as("dst"))
        .unionByName(pairs.toDF("u", "i")
          .select(col("i").as("src"), col("u").as("dst")))
      val got = LabelPropagation.propagate(ed, 2)
        .as[(String, String, Int)].collect()
        .map { case (n, l, r) => n -> ((l, r)) }.toMap
      // round 1: u1 sees {c0, c3, c1} → tie of count 1 → min label c0;
      //          u2 sees {c3, c2} → min label c2.
      assert(got("u1") == ("c0", 1) && got("u2") == ("c2", 1))
      // seeds keep their round-0 labels (clamped — u-votes never flip them)
      assert(got("i0") == ("c0", 0) && got("i3") == ("c3", 0) &&
        got("i6") == ("c2", 0) && got("i9") == ("c1", 0))
      // order-independence: a different physical placement, same result
      val got2 = LabelPropagation.propagate(ed.repartition(7), 2)
        .as[(String, String, Int)].collect()
        .map { case (n, l, r) => n -> ((l, r)) }.toMap
      assert(got2 == got)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("trianglesOf enumerates each triangle exactly once, a<b<c") {
    import spark.implicits._
    try {
      // K4 on {1,2,3,4} minus edge (1,4): triangles {1,2,3} and {2,3,4}.
      val ed = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
        .toDF("i", "j")
      val tri = TriangleCount.trianglesOf(ed)
        .as[(Long, Long, Long)].collect().toSet
      assert(tri == Set((1L, 2L, 3L), (2L, 3L, 4L)))
    } finally SparkEntry.releaseCaches(spark)
  }
}
