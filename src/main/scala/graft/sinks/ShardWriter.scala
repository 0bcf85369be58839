package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialize token-budget training shards (q63's assignment) to disk:
  * one directory partition AND one data file per shard, docs in packing
  * order inside the file.
  *
  * `repartition(shard_id)` gives every shard exactly one owning task
  * (several shards may share a task; a shard never splits across two),
  * `partitionBy` routes each shard to its own directory, and the
  * within-partition sort lays docs out in cumulative-token order — so a
  * training job streams shard N as ONE contiguous, ordered file. The
  * shuffle moves each row once; at 100 TB the writer's parallelism is
  * #shards, which is corpus_tokens / shard_budget — comfortably above
  * any cluster's core count.
  */
object ShardWriter {

  def write(packed: DataFrame, path: String): Unit =
    packed.repartition(col("shard_id"))
      .sortWithinPartitions("shard_id", "cum_tokens")
      .write.partitionBy("shard_id").mode("overwrite").parquet(path)
}
