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
}
