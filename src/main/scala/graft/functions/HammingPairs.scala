package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_hamming_pairs(ps, blk, maxDist, width, nBlocks)` — within-bucket
  * Hamming-neighbor pair generation as a Catalyst Generator: `ps` is a
  * pigeonhole bucket's sorted array<struct<doc_id: bigint, sim: bigint>>
  * for block index `blk` (fingerprints split into `nBlocks` blocks of
  * `width` bits), the output rows are every i < j pair with
  * `bit_count(sim_i ^ sim_j) <= maxDist` — emitted ONLY when `blk` is the
  * pair's LOWEST agreeing block, so across the whole pigeonhole family
  * each qualifying pair is produced exactly once and no downstream
  * `distinct` exchange is needed. Output (id_a, id_b, hamming) with
  * id_a < id_b (the array is doc_id-sorted).
  *
  * Exists because the composed forms both MATERIALIZE the full candidate
  * pair space before the Hamming filter can run: the bucket self-join
  * streams every pair twice through a join probe, and the sorted-array
  * posexplode + slice emission copies O(|bucket|²/2) structs through an
  * exchange — at q33b's deliberately coarse 16-value pigeonhole geometry
  * that is 8.5M pair rows at sf0.1 for the ~2.9M survivors, which then
  * paid a second full exchange in the cross-block distinct. Here the
  * quadratic part is a primitive long-array XOR/popcount loop (the sims
  * are decoded ONCE per bucket into long[]), only survivors become rows,
  * and the first-agreeing-block rule makes the union of all buckets
  * duplicate-free by construction.
  *
  * Buckets at web scale can outgrow one task; callers keep the
  * [[graft.operators.Dedup]] cap split (over-cap buckets take the
  * pairwise-join route with the same first-block predicate) — the
  * generator does not try to split work itself. Interpreted eval only
  * (Generators beyond explode/stack run via CodegenFallback in
  * GenerateExec); the loop is allocation-free per candidate, so there is
  * nothing codegen would save.
  */
case class HammingPairs(child: Expression, blkChild: Expression,
    maxDist: Int, width: Int, nBlocks: Int)
    extends Expression with Generator with CodegenFallback {

  require(maxDist >= 0, "graft_hamming_pairs: maxDist must be >= 0")
  require(width >= 1 && nBlocks >= 1 && width * nBlocks <= 64,
    "graft_hamming_pairs: need width >= 1, nBlocks >= 1, width*nBlocks <= 64")
  // Recall precondition of the first-agreeing-block rule: maxDist
  // differing bits spoil at most maxDist blocks, so any pair within
  // maxDist agrees in >= 1 block ONLY IF maxDist < nBlocks. Violating it
  // would silently drop every pair disagreeing in all blocks.
  require(maxDist < nBlocks,
    "graft_hamming_pairs: maxDist must be < nBlocks (pigeonhole recall)")

  override def children: Seq[Expression] = Seq(child, blkChild)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, blkChild.dataType) match {
      case (ArrayType(StructType(Array(
          StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _),
          IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "graft_hamming_pairs requires (array<struct<doc_id: bigint, " +
          s"sim: bigint>>, blk int), got ${a.catalogString}, ${b.catalogString}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false)))

  private val mask: Long = (1L << width) - 1

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    val blkRaw = blkChild.eval(input)
    if (arr == null || blkRaw == null) return Nil
    val blk = blkRaw match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
    }
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val sims = new Array[Long](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 2)
      ids(i) = st.getLong(0)
      sims(i) = st.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    i = 0
    while (i < n) {
      val si = sims(i)
      var j = i + 1
      while (j < n) {
        val x = si ^ sims(j)
        val d = java.lang.Long.bitCount(x)
        if (d <= maxDist) {
          // emit only from the lowest agreeing block: every earlier
          // block must have a nonzero xor slice
          var b = 0
          var earlierAgrees = false
          while (b < blk && !earlierAgrees) {
            if (((x >>> (width * b)) & mask) == 0L) earlierAgrees = true
            b += 1
          }
          if (!earlierAgrees)
            out += new GenericInternalRow(Array[Any](ids(i), ids(j), d))
        }
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HammingPairs =
    copy(child = newChildren(0), blkChild = newChildren(1))

  override def prettyName: String = "graft_hamming_pairs"
}
