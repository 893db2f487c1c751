package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.IntegerType

/** Exact global ntile WITHOUT an `Exchange SinglePartition`: the
  * classic distributed-rank shape. `ntile(k) OVER (ORDER BY …)` with
  * no PARTITION BY plans every row through one partition — fine for a
  * post-agg handful, a scale-killer over per-document rows (billions
  * at 100 TB). Instead:
  *
  *  1. range-partition by the window's total order (parallel sample +
  *     shuffle — the same work a distributed sort does), sort within
  *     partitions, and PIN the result with a localCheckpoint (range
  *     boundaries come from sampling; two jobs re-planning the
  *     exchange could disagree);
  *  2. `zipWithIndex` over the pinned partitions: partition index then
  *     position IS the global 0-based rank — one count job + one
  *     narrow map, no further shuffle;
  *  3. apply ntile's exact bucket arithmetic to the 1-based rank.
  *
  * The order must be TOTAL (include a unique tiebreaker) or ranks of
  * equal keys depend on partition placement.
  */
object GlobalRank {

  /** SQL ntile semantics: the first `n % k` buckets get
    * `n / k + 1` rows, the rest `n / k` — for 1-based rank `r`. */
  private[graft] def ntileBucket(r: Long, n: Long, k: Int): Int = {
    val q = n / k
    val rem = n % k
    val big = rem * (q + 1)
    if (r <= big) ((r + q) / (q + 1)).toInt
    else (rem + (r - big + q - 1) / q).toInt
  }

  /** Appends an ntile(k)-over-total-`order` column named `out`. */
  def ntileByRange(df: DataFrame, k: Int, order: Seq[Column], out: String): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = df.sparkSession
    // pin the INPUT first: repartitionByRange runs a sampling pass over
    // its child before the shuffle, so an unpinned upstream (e.g. an
    // expensive join/agg pipeline) would execute twice
    val pinned = df.localCheckpoint()
    val snap = pinned.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val n = snap.count()
    val rdd = snap.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ ntileBucket(idx + 1, n, k))
    }
    spark.createDataFrame(rdd, snap.schema.add(out, IntegerType, nullable = false))
  }
}
