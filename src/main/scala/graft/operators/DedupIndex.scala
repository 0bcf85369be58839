package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash band index — the storage-layout half of incremental
  * dedup. q62 computes the corpus band index inline; at 100 TB that index
  * is precomputed once and probed by every daily batch, so its layout
  * decides the probe cost.
  *
  * `write` persists (doc_id, band, bucket) bucketed+sorted by the join
  * key (band, bucket). `probeCandidates` joins a (small) batch's bands
  * against it: the index side's bucketing already satisfies the join's
  * required distribution, so the CORPUS side never shuffles — only the
  * batch side exchanges (to the index's bucket count). Work per probe is
  * O(batch + collisions), and the index is read in place, exactly like
  * [[AnnIndex]] does for IVF probes.
  */
object DedupIndex {

  /** Persist a band index (doc_id, band, bucket) bucketed by join key.
    * Overwrite holds across JVM restarts too: with the in-memory catalog,
    * a fresh session does not know the table, but its warehouse location
    * may survive from a previous run — CREATE would then fail with
    * LOCATION_ALREADY_EXISTS, so a stale catalog-less location is removed
    * first.
    */
  def write(bands: DataFrame, table: String, buckets: Int): Unit = {
    val spark = bands.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    bands.write.bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
      .mode("overwrite").saveAsTable(table)
  }

  /** Candidate near-dup pairs of `batchBands` (id_new, band, bucket)
    * against the persisted corpus index: (id_new, id_old) for every
    * shared band bucket. Exact-Jaccard verification stays the caller's
    * job (the index holds no shingles).
    */
  def probeCandidates(spark: SparkSession, table: String,
      batchBands: DataFrame): DataFrame = {
    val idx = spark.table(table)
      .select(col("doc_id").as("id_old"), col("band"), col("bucket"))
    idx.join(batchBands, Seq("band", "bucket"))
      .select("id_new", "id_old").distinct()
  }
}
