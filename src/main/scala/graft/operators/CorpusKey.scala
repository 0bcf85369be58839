package graft.operators

import org.apache.hadoop.fs.Path
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
  * PATH RELATIVE TO THE CORPUS DIR (bare names would let a file move
  * between subdirectories unnoticed, r7 advice), length, and
  * modification time, plus each subdirectory's relative path — in the
  * table name itself. Regenerating the data changes mtimes, so the name
  * changes and the first consumer rebuilds; distinct dirs differ in the
  * sanitized path even on a 31-bit hash collision. The listing is one
  * driver-side recursive stat of the corpus dir (hundreds of files —
  * microseconds on any FS; a production deployment keys on the table
  * format's snapshot/version id instead, which is this same fingerprint
  * maintained by the writer).
  *
  * Superseded artifacts are garbage-collected at build time:
  * [[prepareBuild]] deletes sibling warehouse locations (and catalog
  * entries) sharing the table's `<prefix>_<dirSuffix>_` stem with a
  * DIFFERENT fingerprint — without this every corpus regeneration leaks
  * one table per artifact family forever (r7 advice).
  */
object CorpusKey {

  /** Catalog-safe memo-table name: `<prefix>_<dirSuffix>_<fingerprint>`. */
  def tableName(s: SparkSession, prefix: String, dir: String): String =
    s"${prefix}_${sanitized(dir)}_${fingerprint(s, dir)}"

  /** Readable suffix of the dir PLUS a hash of the FULL path: the
    * truncated suffix alone can collide between two long paths (or paths
    * differing only in non-alphanumerics), and since [[prepareBuild]]'s
    * superseded-sibling GC keys on this stem, a collision would let one
    * corpus's build drop the other's still-valid memo table (r8 advice).
    * The path hash makes the stem unique per directory string, so GC
    * only ever matches artifacts of the same corpus dir.
    */
  private def sanitized(dir: String): String = {
    val suffix = dir.replaceAll("[^a-zA-Z0-9]+", "_")
      .replaceAll("^_+|_+$", "").takeRight(32).toLowerCase
    val ph = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir) & 0x7fffffff)
    s"${suffix}_p$ph"
  }

  private def fingerprint(s: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val rootUri = fs.makeQualified(p).toUri
    def rel(q: Path): String =
      rootUri.relativize(fs.makeQualified(q).toUri).getPath
    def walk(d: Path): Unit =
      fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
        if (st.isDirectory) {
          entries += s"d|${rel(st.getPath)}"
          walk(st.getPath)
        } else entries +=
          s"f|${rel(st.getPath)}|${st.getLen}|${st.getModificationTime}"
      }
    if (fs.exists(p)) walk(p)
    val fp = scala.util.hashing.MurmurHash3.orderedHash(entries) & 0x7fffffff
    java.lang.Integer.toHexString(fp)
  }

  /** Call under the builder's lock, right before writing `table`:
    *
    *  1. removes SUPERSEDED sibling artifacts — warehouse locations
    *     named `<stem><otherFingerprint>` where `<stem>` is `table`
    *     minus its fingerprint, plus any catalog entries for them
    *     (a same-session corpus regeneration leaves both behind);
    *  2. removes `table`'s own stale catalog-less location from a
    *     previous JVM (the in-memory catalog forgets tables; the
    *     warehouse dir does not — CREATE would fail with
    *     LOCATION_ALREADY_EXISTS).
    */
  def prepareBuild(s: SparkSession, table: String): Unit = {
    val wh = new Path(s.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    val stem = table.substring(0, table.lastIndexOf('_') + 1)
    // One-time migration (r9 advice): artifacts memoized before the
    // `_p<pathhash>` stem segment existed are named `<stem'>_<fp>` where
    // stem' lacks the p-segment — invisible to the sweep below, so each
    // would orphan forever. Sweep that legacy stem too; the p-segment is
    // always the stem's final component, so stripping it is unambiguous.
    // (A legacy name can only be this corpus family's: the fp suffix is
    // bare hex, which the `p...` segment of any new-scheme name is not.)
    val legacyStem = stem.replaceFirst("_p[0-9a-f]{1,8}_$", "_")
    val stems = Seq(stem) ++ (if (legacyStem != stem) Seq(legacyStem) else Nil)
    if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
      val n = st.getPath.getName
      val superseded = stems.exists(sm => n != table && n.startsWith(sm) &&
        n.substring(sm.length).matches("[0-9a-f]+"))
      if (superseded) {
        if (s.catalog.tableExists(n)) s.sql(s"DROP TABLE `$n`")
        if (fs.exists(st.getPath)) fs.delete(st.getPath, true)
      }
    }
    val loc = new Path(wh, table)
    if (!s.catalog.tableExists(table) && fs.exists(loc)) fs.delete(loc, true)
  }
}
