package graft.functions

import java.nio.ByteBuffer
import java.util.PriorityQueue

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` best (score desc, id asc)
  * pairs seen per group in a fixed-size binary heap.
  *
  * This is the scale-safe replacement for `row_number() OVER
  * (PARTITION BY group ORDER BY score DESC) <= k`: the window form
  * shuffles the ENTIRE scored relation (|queries|·|corpus| rows for a
  * top-k search) to rank it, while a TypedImperativeAggregate gets
  * map-side partial aggregation for free — each input partition ships
  * only its local top-k per group, so the shuffle volume is
  * O(groups · k · partitions) regardless of corpus size.
  *
  * Result: `array<struct<score:double, id:bigint>>`, best first,
  * deterministic tie-break by id ascending. The id input must be an
  * integral type (tinyint/smallint/int/bigint) — it is widened to
  * bigint in the output; non-integral ids (e.g. string keys) fail at
  * analysis time with a clear message rather than silently dropping
  * rows through a null-producing cast. Null ids/scores are skipped.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[TopKByScore.Entry]]
  with BinaryLike[Expression] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType &&
        Seq(ByteType, ShortType, IntegerType, LongType).contains(id.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_by_score expects (double, integral id widened to bigint), got " +
          s"(${score.dataType}, ${id.dataType}) — string or other non-integral ids " +
          "are not supported (a silent cast would drop all rows)")

  override def createAggregationBuffer(): PriorityQueue[TopKByScore.Entry] =
    new PriorityQueue[TopKByScore.Entry](k + 1, TopKByScore.worstFirst)

  private def add(buf: PriorityQueue[TopKByScore.Entry], s: Double, i: Long): Unit = {
    if (buf.size < k) {
      buf.offer(new TopKByScore.Entry(s, i))
    } else {
      val worst = buf.peek()
      // better than the current worst: higher score, ties to lower id
      if (s > worst.score || (s == worst.score && i < worst.id)) {
        buf.poll()
        buf.offer(new TopKByScore.Entry(s, i))
      }
    }
  }

  override def update(
      buf: PriorityQueue[TopKByScore.Entry], input: InternalRow): PriorityQueue[TopKByScore.Entry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, s.asInstanceOf[Double], i.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(
      buf: PriorityQueue[TopKByScore.Entry],
      other: PriorityQueue[TopKByScore.Entry]): PriorityQueue[TopKByScore.Entry] = {
    val it = other.iterator()
    while (it.hasNext) { val e = it.next(); add(buf, e.score, e.id) }
    buf
  }

  override def eval(buf: PriorityQueue[TopKByScore.Entry]): Any = {
    val arr = buf.toArray(new Array[TopKByScore.Entry](buf.size))
    java.util.Arrays.sort(arr, TopKByScore.bestFirst)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      arr.map(e => new GenericInternalRow(Array[Any](e.score, e.id))).toArray[Any])
  }

  override def serialize(buf: PriorityQueue[TopKByScore.Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[TopKByScore.Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(new TopKByScore.Entry(bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  final class Entry(val score: Double, val id: Long)

  /** Heap order: head = WORST kept entry (lowest score, ties to highest
    * id) so eviction is O(log k) at the head. */
  val worstFirst: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }

  /** Output order: best first — score desc, id asc. */
  val bestFirst: java.util.Comparator[Entry] = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }
}
