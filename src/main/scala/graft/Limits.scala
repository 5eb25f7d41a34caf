package graft

/** Project-wide size gates. */
object Limits {

  /** Max rows a small-ish table may have before an EXPLICIT broadcast
    * hint is dropped (a hint is honored regardless of size, so past
    * this the join strategy is left to Catalyst/AQE). One constant so
    * every gated hint (dedup signatures, replay corpus, …) moves
    * together when tuned.
    */
  val BroadcastRows: Long = 1L << 20

  /** Companion byte gate for wide-row tables (document text, payload
    * blobs): a row-count gate alone still allows a multi-GB forced
    * broadcast when rows are kilobytes wide.
    */
  val BroadcastBytes: Long = 64L << 20

  /** Max key-set size collected to the driver to become a pushed-down
    * IN filter (row-group skipping) instead of a semi join (full scan,
    * row pruning only). 64k longs ≈ 512 KB on the driver and in each
    * task's filter — cheap — while covering any realistic candidate set.
    */
  val InListRows: Long = 1L << 16
}
