package graft.operators

/** Id-space layout shared by every query that synthesizes a twin /
  * variant corpus alongside the base tables.
  *
  * The battery's dedup, ANN and media families plant deterministic
  * near-duplicates by re-emitting each base row at
  * `id + VariantOffset`; incremental flows split "already ingested"
  * from "incoming" with `id < VariantOffset`. The offset therefore
  * caps the base corpus the battery stays correct on: ids at or above
  * it would collide with the planted twins. The original 10^6 reserve
  * was fine for the driver SFs (sf1 = 6·10^5 docs) but collides at
  * sf10 (6·10^6) — and a 100 TB corpus is orders of magnitude past
  * that. 10^12 keeps the whole battery id-safe to a trillion base
  * docs while staying far inside Long range for the +offset twin ids.
  */
object Ids {
  val VariantOffset: Long = 1000000000000L
}
