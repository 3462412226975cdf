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

/** Capped long-collection aggregate: gathers up to `cap` DISTINCT-BY-
  * CONSTRUCTION long inputs per group and evaluates to NULL the moment
  * the group would exceed the cap.
  *
  * This is the scale-safe single-pass form of "collect the ids per key
  * but drop hot keys": a plain `collect_set` materializes a hot key's
  * ENTIRE id set in the aggregation buffer before any df filter can
  * drop it (a boilerplate 40-char window shared by millions of
  * documents = a multi-GB buffer on one key), while the usual
  * workaround — count df first, anti-join the hot keys out, aggregate
  * the survivors — pays a second full pass plus an extra shuffle.
  * Here the buffer itself is the guard: it holds at most `cap` longs
  * and an overflow bit, map-side partials ship at most `cap` longs per
  * local group, and an overflowed group evaluates to NULL (filter it
  * out) without ever having held more than `cap + 1` entries anywhere.
  *
  * Inputs must be distinct per group by construction (e.g. exploded
  * (key, id) pairs that are unique upstream) — the buffer concatenates
  * without deduping, so duplicate inputs would count twice toward the
  * cap. Null inputs are skipped. */
case class CappedLongList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongList.Buf]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cap >= 1, s"capped_long_list requires cap >= 1, got $cap")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(ByteType, ShortType, IntegerType, LongType).contains(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"capped_long_list expects an integral input, got ${child.dataType}")

  override def createAggregationBuffer(): CappedLongList.Buf =
    new CappedLongList.Buf(new Array[Long](math.min(cap, 8)), 0, false)

  private def add(buf: CappedLongList.Buf, v: Long): CappedLongList.Buf = {
    if (buf.overflowed) return buf
    if (buf.n >= cap) { buf.overflowed = true; return buf }
    if (buf.n == buf.a.length)
      buf.a = java.util.Arrays.copyOf(buf.a, math.min(cap, buf.a.length * 2))
    buf.a(buf.n) = v
    buf.n += 1
    buf
  }

  override def update(buf: CappedLongList.Buf, input: InternalRow): CappedLongList.Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Number].longValue()) else buf
  }

  override def merge(buf: CappedLongList.Buf, other: CappedLongList.Buf): CappedLongList.Buf = {
    if (other.overflowed) { buf.overflowed = true; return buf }
    var i = 0
    while (i < other.n && !buf.overflowed) { add(buf, other.a(i)); i += 1 }
    buf
  }

  override def eval(buf: CappedLongList.Buf): Any =
    if (buf.overflowed) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(buf.a, buf.n))

  override def serialize(buf: CappedLongList.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + 8 * buf.n)
    bb.put(if (buf.overflowed) 1.toByte else 0.toByte)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongList.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val over = bb.get() == 1.toByte
    val n = bb.getInt
    val a = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { a(i) = bb.getLong; i += 1 }
    new CappedLongList.Buf(a, n, over)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedLongList =
    copy(child = newChild)
  override def prettyName: String = "capped_long_list"
}

object CappedLongList {
  /** Mutable aggregation state: collected longs, count, overflow bit. */
  final class Buf(var a: Array[Long], var n: Int, var overflowed: Boolean)
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
