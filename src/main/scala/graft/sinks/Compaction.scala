package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every streaming
  * ingest needs: micro-batches leave thousands of KB-sized files, and
  * scan throughput dies on per-file open cost long before data volume
  * matters. Compaction bin-packs files into target-size groups and
  * rewrites each group as one file.
  *
  * Scale shape (how Delta/Iceberg OPTIMIZE does it): the DRIVER reads
  * only file METADATA (name, size — #files rows, never data), assigns
  * groups by first-fit running sum in deterministic name order (the
  * q06/q63 packing rule applied to bytes), and ONE distributed job
  * rewrites the data: rows join their file's group id via a broadcast
  * map on input_file_name(), repartition on the group id gives every
  * group a single owning task (the ShardWriter trick), and each task
  * writes its groups' rows as one file per group. Reading 10k small
  * files into 32 tasks is exactly what the parquet reader is for; no
  * per-group job loop.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int, groups: Int)

  /** Compact `inPath`'s parquet files into `outPath`, ~`targetBytes`
    * per output file.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long): Stats = {
    val fs = new Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // assignment must cover EXACTLY the files the parquet reader will
    // read — Spark reads every non-hidden file regardless of extension
    // (an extensionless 'part-00000' is data too), and skips '_'/'.'
    // prefixed ones. An extension filter here would silently drop the
    // unmatched files' rows through the inner join below.
    val files = fs.listStatus(new Path(inPath)).toSeq
      .filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.getName)
    // first-fit by running byte sum, like q63's token packing: group =
    // floor((cum - 1) / target); a file larger than the target gets its
    // own group rather than splitting (compaction merges, never splits)
    var cum = 0L
    // keyed by BASENAME (unique within the directory): input_file_name()
    // and Hadoop render the scheme differently (file:/ vs file:///), and
    // a silently-unmatched URI would drop rows through the inner join
    val assignment = files.map { f =>
      cum += math.max(f.getLen, 1L)
      (f.getPath.getName, (cum - 1) / math.max(targetBytes, 1L))
    }
    val nGroups = assignment.map(_._2).distinct.size
    import spark.implicits._
    val groupMap = assignment.toDF("file", "grp")
    spark.read.parquet(inPath)
      .withColumn("file", substring_index(input_file_name(), "/", -1))
      .join(broadcast(groupMap), "file")
      .repartition(col("grp"))
      .sortWithinPartitions("grp")
      .write.partitionBy("grp").mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new Path(outPath)).toSeq
      .filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    Stats(files.size, after, nGroups)
  }
}
