package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split can't help (e.g. the skew is in a single key of a
  * shuffle-hash join, or the planner lacks runtime stats).
  *
  * Standard two-sided construction:
  *  - FACT side (large, skewed): append `salt = pmod(hash(whole row key +
  *    a disambiguator), buckets)` — rows of one hot key spread across
  *    `buckets` shuffle partitions instead of hammering one.
  *  - DIM side (smaller): explode each row into all `buckets` salt values,
  *    so every fact replica still finds its match.
  *
  * Join keys become (keys..., salt): same results as the unsalted join
  * (inner/left semantics preserved — the dim side is replicated, never
  * filtered), shuffle skew bounded by |hot key| / buckets.
  *
  * Cost model: dim side inflates ×buckets — use for dim sides too big to
  * broadcast but ≪ fact side, with buckets sized to the executor count.
  */
object SkewJoin {

  /** Inner/left equi-join of `fact` ⋈ `dim` on `keys`, salted across
    * `buckets`. `disambiguator` picks the fact column(s) whose hash
    * spreads the hot key's rows (defaults to all fact columns via a
    * monotonic row id would be nondeterministic — callers pass a stable
    * column like an id or payload).
    */
  def join(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      disambiguator: Column,
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(disambiguator), lit(buckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedFact
      .join(saltedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
