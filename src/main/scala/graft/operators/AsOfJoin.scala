package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key. Spark has no native ASOF join;
  * this composes existing operators (the preferred extension route):
  * tag both inputs, union, and take a running `last_value(ignoreNulls)`
  * of the right payload over (key, ts) order.
  *
  * Scale properties: ONE shuffle on the key (the union sorts within
  * partitions), no range-explosion the way an inequality join would plan,
  * and state per row is a single struct — this shape survives a 1000×
  * scale-up where a theta-join (`r.ts <= l.ts` + window dedup) would
  * produce quadratic intermediates on hot keys.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (its columns come back nested in `asofCol`)
    * @param key       equality key column (present on both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param asofCol   name of the output struct column with the matched
    *                  right row (null when no right row precedes)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      asofCol: String = "asof"): DataFrame = {
    val leftCols = left.columns

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_is_left", lit(1))
    val r = right
      .select(col(key), col(rightTs).as("_ts"), lit(0).as("_is_left"),
        struct(right.columns.map(col).toIndexedSeq: _*).as("_payload"))

    // Right rows sort before left rows at equal ts (_is_left asc), giving
    // the `right.ts <= left.ts` inclusive semantics.
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asofCol, last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(leftCols.map(col) :+ col(asofCol): _*)
  }
}
