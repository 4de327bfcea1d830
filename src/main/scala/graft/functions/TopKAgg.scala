package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** One (score, id) candidate held in a top-k buffer. */
private[functions] final case class TopKEntry(score: Double, id: Long)

private[functions] object TopKEntry {
  /** head = WORST retained entry (lowest score, then largest id): the
    * entry the next better candidate evicts. A named Serializable class,
    * not a lambda — the expression ships inside the physical plan.
    */
  val worstFirst: Comparator[TopKEntry] =
    new Comparator[TopKEntry] with Serializable {
      override def compare(a: TopKEntry, b: TopKEntry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    }
}

/** Per-group TOP-K as a true AGGREGATE — the scale form of the
  * `row_number().over(Window.partitionBy(group)).filter(rn <= k)` idiom.
  *
  * The window form does no partial work: every candidate row of a group
  * shuffles to, sorts in, and is held by ONE task — for a batch-ANN query
  * the whole probed corpus fraction serializes per query. This aggregate
  * keeps a BOUNDED k-entry min-heap per group on every input partition
  * (map-side partial: a group costs k entries per task, not its posting
  * list), merges heaps at reduce, and emits the final array sorted
  * best-first. Candidates that cannot beat the current worst are rejected
  * in O(1) without allocation.
  *
  * Ordering is the dedup/ANN surface's standard total order — score
  * DESCENDING, id ASCENDING on ties (`java.lang.Double.compare`, so NaN
  * ranks above every real score, matching Spark's sort semantics) —
  * bit-identical to the window form's `orderBy(col(score).desc, col(id))`,
  * asserted in AnnRecallSpec. Null scores are skipped, as a descending
  * NULLS LAST sort would place them past rank k anyway.
  *
  * Returns `array<struct<score: double, id: bigint>>`, best first.
  */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[TopKEntry]]
    with ImplicitCastInputTypes {
  require(k > 0, "top-k needs k > 0")

  // update() casts eval results straight to Double/Long, so mistyped
  // columns must be coerced (or rejected) at ANALYSIS time — without this,
  // a SQL caller passing an int score compiles the plan and then throws
  // ClassCastException inside executors (advisor r8)
  // Seq[DataType] <: Seq[AbstractDataType] (covariant return narrowing) —
  // AbstractDataType itself is private[sql], unnameable from here
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  private def worstFirst = TopKEntry.worstFirst

  override def createAggregationBuffer(): PriorityQueue[TopKEntry] =
    new PriorityQueue[TopKEntry](k + 1, worstFirst)

  private def offer(buf: PriorityQueue[TopKEntry], e: TopKEntry): Unit =
    if (buf.size < k) { buf.add(e); () }
    else if (worstFirst.compare(e, buf.peek()) > 0) {
      buf.poll(); buf.add(e); ()
    }

  override def update(buf: PriorityQueue[TopKEntry],
      input: InternalRow): PriorityQueue[TopKEntry] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      offer(buf, TopKEntry(s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: PriorityQueue[TopKEntry],
      other: PriorityQueue[TopKEntry]): PriorityQueue[TopKEntry] = {
    other.forEach(e => offer(buf, e))
    buf
  }

  override def eval(buf: PriorityQueue[TopKEntry]): Any = {
    val arr = new Array[TopKEntry](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, worstFirst.reversed()) // best first
    new GenericArrayData(arr.map(e =>
      InternalRow(e.score, e.id).asInstanceOf[Any]))
  }

  override def serialize(buf: PriorityQueue[TopKEntry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { e => bb.putDouble(e.score); bb.putLong(e.id); () }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[TopKEntry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(TopKEntry(bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}

/** Column-API face of the aggregate kernels. */
object AggExprs {
  /** `topKByScore(score, id, k)` — per-group top-k with map-side partial
    * pruning; see [[TopKByScore]]. `id` must be a long column.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(score),
      Bridge.expression(id), k).toAggregateExpression())
}
