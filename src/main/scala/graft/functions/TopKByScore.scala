package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk(score, id, k)` — top-k by (score DESC, id ASC) as a bounded
  * aggregate.
  *
  * The window idiom for per-group top-k (`row_number() OVER (... ORDER
  * BY score DESC)` then `rk <= k`) SORTS every group in full before
  * discarding all but k rows — at 100 TB that is a full shuffle + sort
  * of the fact table for a k-row answer per group. This aggregate keeps
  * a k-bounded min-heap per group instead: updates are O(log k), partial
  * aggregation combines on the map side, merge unions two heaps, and
  * only k rows per group ever cross the wire. Order-independent by
  * construction: (score, id) is a strict total order (ids unique), so
  * the kept set — and the fully-sorted output array — is the same
  * whatever the arrival or merge order, which keeps the result
  * oracle-checkable against the window rendering.
  *
  * Runs under ObjectHashAggregate (TypedImperativeAggregates are not
  * codegen'd — the right trade for heap state).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, "graft_topk: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)

  // without this, a wrongly-typed id surfaces as a mid-job
  // ClassCastException inside update() instead of an analysis error
  // (ImplicitCastInputTypes still lets numeric inputs widen for free)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k)

  override def update(buf: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScore.Buffer, other: TopKByScore.Buffer): TopKByScore.Buffer = {
    other.items.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKByScore.Buffer): Any = {
    // full order only at eval time, over ≤ k entries
    val sorted = buf.items.toArray.sortWith { case ((s1, i1), (s2, i2)) =>
      s1 > s2 || (s1 == s2 && i1 < i2)
    }
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })
  }

  override def serialize(buf: TopKByScore.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.items
    out.writeInt(items.size)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKByScore.Buffer(k)
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_topk"
}

object TopKByScore {

  /** k-bounded heap; root = worst kept entry ((score ASC, id DESC) min). */
  final class Buffer(k: Int) {
    private val heap = mutable.PriorityQueue.empty[(Double, Long)](
      // PriorityQueue pops the MAX of the ordering, so order "worst first"
      // reversed: the max under this ordering is the worst kept entry
      Ordering.fromLessThan[(Double, Long)] { case ((s1, i1), (s2, i2)) =>
        s1 > s2 || (s1 == s2 && i1 < i2)
      })

    def add(s: Double, i: Long): Unit =
      if (heap.size < k) heap.enqueue((s, i))
      else {
        val (ws, wi) = heap.head
        val better = s > ws || (s == ws && i < wi)
        if (better) { heap.dequeue(); heap.enqueue((s, i)) }
      }

    def items: Iterable[(Double, Long)] = heap
  }
}
