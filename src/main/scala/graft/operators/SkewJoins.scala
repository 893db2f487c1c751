package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for fact-fact equi joins (builder prompt: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains necessary when a single key's rows exceed what one
  * task can hold even after AQE splitting (e.g. a null-key or
  * celebrity-entity hotspot), or when the join sits under an operator
  * AQE won't re-plan. The salt here is derived from `hash()` of the
  * probe row (deterministic — no `rand()`, so retried tasks produce
  * identical output and results are reproducible run to run).
  */
object SkewJoins {

  /** Equi join where `left` is skewed on `leftKey`: left rows get a
    * deterministic salt in [0, buckets); `right` is replicated once per
    * salt value. The join key becomes (key, salt), spreading a hot key
    * over `buckets` tasks at the cost of a `buckets`× blow-up of the
    * (smaller) right side — choose `buckets` ≈ hot-key rows / target
    * task size.
    *
    * `saltCols` drives the salt hash and must vary WITHIN a hot key
    * (a line number, timestamp, secondary id — never the key alone, or
    * the hot key lands in one bucket again). Callers pick the narrowest
    * such set: hashing every column would salt correctly too, but it
    * blocks column pruning — the scan then reads the full row width
    * just to compute a 2-bit salt, which at 100 TB is the difference
    * between shuffling 3 columns and shuffling 30. */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      saltCols: Seq[Column],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(buckets)))
    val saltedRight = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedLeft
      .join(saltedRight,
        leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }
}
