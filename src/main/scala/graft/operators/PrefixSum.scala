package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sum — the two-pass prefix-sum pattern.
  *
  * A global `Window.orderBy` plans a single-partition sort of the whole
  * table: the definitive scale-killer for running totals. This operator
  * derives a block key FROM the (numeric, monotone) order key itself —
  * `key div blockSize` is monotone in the key, so ordering across blocks
  * is correct by construction and no range exchange is needed. The plan:
  *
  *  1. one hash shuffle on the block key → per-block running sums, fully
  *     parallel;
  *  2. a tiny aggregate (one row per block) ordered by block id → running
  *     block offsets — the only single-partition window, over #blocks
  *     rows, not #rows;
  *  3. offsets broadcast back and added map-side.
  *
  * Used by q06 (batch assignment by cumulative compressed size) and q63
  * (packing documents into fixed-token-budget training shards).
  */
object PrefixSum {

  /** Adds `outCol` = running sum of `valueCol` ordered by `orderCol`.
    *
    * @param orderCol numeric, globally unique, roughly dense key (ordering
    *                 AND block derivation); ties are impossible by
    *                 uniqueness, so the sum is deterministic
    * @param blockSize order-key span per block — size it so #rows/block
    *                  fits a task comfortably and #blocks stays far below
    *                  the broadcast threshold
    */
  def overBlocks(df: DataFrame, orderCol: String, valueCol: String,
      blockSize: Long, outCol: String): DataFrame = {
    val blk: Column = expr(s"$orderCol div $blockSize")
    val wLocal = Window.partitionBy("_psum_blk").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("_psum_blk", blk)
      .withColumn("_psum_local", sum(valueCol).over(wLocal))
    // block totals = the window's last running value, so both branches
    // share the scan + exchange subtree; the offsets window runs over
    // #blocks rows only
    val wOff = Window.orderBy("_psum_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("_psum_blk")
      .agg(max("_psum_local").as("_psum_btotal"))
      .withColumn("_psum_off", coalesce(sum("_psum_btotal").over(wOff), lit(0L)))
      .select("_psum_blk", "_psum_off")
    local.join(broadcast(offsets), "_psum_blk")
      .withColumn(outCol, col("_psum_local") + col("_psum_off"))
      .drop("_psum_blk", "_psum_local", "_psum_off")
  }
}
