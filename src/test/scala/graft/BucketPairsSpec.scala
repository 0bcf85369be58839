package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The shared within-bucket pair-emission helpers: [[Dedup.bucketPairs]]
  * (sorted-struct-array i<j explode with the over-cap pairwise-join
  * fallback) and [[Dedup.hammingBlockPairs]] (native first-agreeing-block
  * generator with the same fallback). Both must produce exactly the
  * naive self-join's pair set on arbitrary inputs, on BOTH routes —
  * r7's plan review flagged that the band/block families still streamed
  * every pair twice; these are the r8 replacements.
  */
class BucketPairsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def naivePairs(rows: Seq[(Int, Long)]): Set[(Long, Long)] =
    rows.groupBy(_._1).values.flatMap { bucket =>
      val ids = bucket.map(_._2)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet

  test("bucketPairs: array path emits each unordered pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // skewed buckets: one hub with 40 members, many small ones
    val rows = (0 until 40).map(i => (7, i.toLong)) ++
      (0 until 60).map(_ => (rnd.nextInt(10), 100L + rnd.nextInt(30)))
    val dedup = rows.distinct
    val df = dedup.toDF("bucket", "doc_id")
    val got = Dedup.bucketPairs(df, Seq("bucket"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly once: no duplicates even for pairs sharing several buckets
    val naiveMulti = dedup.groupBy(_._1).values.flatMap { bucket =>
      val ids = bucket.map(_._2)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSeq
    assert(got.sorted == naiveMulti.sorted)
    assert(got.forall { case (a, b) => a < b })
  }

  test("bucketPairs: over-cap buckets take the join fallback, same pairs") {
    import spark.implicits._
    val rows = ((0 until 30).map(i => (1, i.toLong)) ++ // over cap=8
      (0 until 5).map(i => (2, 100L + i))).toDF("bucket", "doc_id")
    val got = Dedup.bucketPairs(rows, Seq("bucket"), cap = 8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = naivePairs((0 until 30).map(i => (1, i.toLong)) ++
      (0 until 5).map(i => (2, 100L + i)))
    assert(got == want)
  }

  test("hammingBlockPairs ≡ naive all-pairs hamming on random fingerprints (both routes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // clustered sims force near pairs; 64-bit geometry, width 16
    val base = Seq.fill(8)(rnd.nextLong())
    val docs = (0L until 120L).map { id =>
      val b = base(rnd.nextInt(base.size))
      val flips = rnd.nextInt(5)
      val sim = (0 until flips).foldLeft(b)((s, _) => s ^ (1L << rnd.nextInt(64)))
      (id, sim)
    }
    val naive = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb)
      if d <= 3
    } yield (ia, ib, d)).toSet
    val lng = docs.toDF("doc_id", "sim")
      .select(col("doc_id"), col("sim"),
        explode(expr("array(0, 1, 2, 3)")).as("blk"))
      .withColumn("block", expr("shiftright(sim, blk * 16) & 65535"))
      .select("blk", "block", "doc_id", "sim")
    // generator route (cap high) and fallback route (cap 1: every
    // multi-doc bucket takes the pairwise join) must agree exactly
    for (cap <- Seq(4096, 1)) {
      val got = Dedup.hammingBlockPairs(lng, Seq("blk", "block"),
          maxDist = 3, width = 16, nBlocks = 4, cap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.length == got.toSet.size, s"duplicate pairs at cap=$cap")
      assert(got.toSet == naive, s"pair set mismatch at cap=$cap")
    }
  }

  test("hammingBlockPairs: mixed routes stay duplicate-free (cap between bucket sizes)") {
    import spark.implicits._
    // two docs with IDENTICAL sims agree on every block; with one giant
    // bucket over cap and the rest under, the pair must still appear once
    val docs = (0L until 40L).map(id => (id, 0x0123456789abcdefL)) :+
      ((99L, 0x0123456789abcdeeL)) // hamming 1 from the cluster
    val lng = docs.toDF("doc_id", "sim")
      .select(col("doc_id"), col("sim"),
        explode(expr("array(0, 1, 2, 3)")).as("blk"))
      .withColumn("block", expr("shiftright(sim, blk * 16) & 65535"))
      .select("blk", "block", "doc_id", "sim")
    // blk0 bucket has the 40 identical docs (small route at cap=40);
    // blk1..3 buckets hold all 41 docs (doc 99 agrees there) → large
    // route. Cluster pairs emit from blk0, the 40 (cluster, 99) pairs
    // from blk1's fallback — exactly once each.
    val got = Dedup.hammingBlockPairs(lng, Seq("blk", "block"),
        maxDist = 3, width = 16, nBlocks = 4, cap = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "duplicates across routes")
    assert(got.toSet.size == 40 * 39 / 2 + 40)
  }
}
