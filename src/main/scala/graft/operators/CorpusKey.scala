package graft.operators

import org.apache.spark.sql.SparkSession

/** Naming for corpus-derived memoized tables (cluster map, band index,
  * suffix ranks): the name must be unique per corpus CONTENT, not per
  * directory string, or two hazards appear (r6 advice):
  *
  *  1. collision — two distinct dirs hashing alike in one warehouse would
  *     silently serve the wrong artifact;
  *  2. staleness — regenerated data at the same path would keep serving
  *     the old artifact, because tableExists short-circuits the rebuild.
  *
  * Both are closed by embedding (a) a sanitized suffix of the dir path
  * and (b) a fingerprint of the dir's file inventory — every file's
  * name, length, and modification time — in the table name itself.
  * Regenerating the data changes mtimes, so the name changes and the
  * first consumer rebuilds; distinct dirs differ in the sanitized path
  * even on a 31-bit hash collision. The listing is one driver-side
  * recursive stat of the corpus dir (hundreds of files — microseconds
  * on any FS; a production deployment keys on the table format's
  * snapshot/version id instead, which is this same fingerprint
  * maintained by the writer).
  */
object CorpusKey {

  /** Catalog-safe memo-table name: `<prefix>_<dirSuffix>_<fingerprint>`. */
  def tableName(s: SparkSession, prefix: String, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(d: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else entries += s"${st.getPath.getName}|${st.getLen}|${st.getModificationTime}"
      }
    if (fs.exists(p)) walk(p)
    val fp = scala.util.hashing.MurmurHash3.orderedHash(entries) & 0x7fffffff
    val sanitized = dir.replaceAll("[^a-zA-Z0-9]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(40).toLowerCase
    s"${prefix}_${sanitized}_${java.lang.Integer.toHexString(fp)}"
  }
}
