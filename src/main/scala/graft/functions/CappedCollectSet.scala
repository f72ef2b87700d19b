package graft.functions



import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Memory-BOUNDED distinct-collect for the dedup mega-bucket guard: keeps at
 * most `cap + 1` distinct values per group and a total row count. A plain
 * `collect_set` materializes the ENTIRE bucket in the aggregation buffer
 * before any size filter can run — exactly on the degenerate-signature
 * buckets the guard exists to drop, one such bucket at corpus scale is an
 * executor OOM, not a loud drop. This aggregate stops retaining values the
 * moment a group is over the cap (the guard will discard it anyway) while
 * still reporting how big it was.
 *
 * Output: `struct(n BIGINT, ids ARRAY<child>)`
 *  - under the cap: `n` = exact distinct count, `ids` = sorted distinct values
 *    (identical to `sort_array(collect_set(child))`);
 *  - over the cap: `n` = total rows observed (≥ distinct count — a diagnostic
 *    magnitude, the load-bearing bit is `n > cap`), `ids` truncated.
 *
 * Buffers cross the partial→final exchange as UnsafeRow bytes (the same
 * projection technique Spark's own Collect aggregate uses); each buffer is
 * ≤ cap+1 values by construction, so serialization cost is bounded too.
 */
case class CappedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectSet.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("ids", ArrayType(child.dataType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // types whose Catalyst-internal values are Serializable AND Comparable
    // (the eval sort and the buffer serialization both rely on it)
    case _: NumericType | _: StringType | _: BooleanType | _: DateType | _: TimestampType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"capped_collect_set requires an atomic orderable input type, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): CappedCollectSet.Buf = new CappedCollectSet.Buf()

  override def update(buf: CappedCollectSet.Buf, input: InternalRow): CappedCollectSet.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.rows += 1L
      if (buf.set.size <= cap) buf.set.add(CappedCollectSet.own(v))
    }
    buf
  }

  override def merge(buf: CappedCollectSet.Buf, other: CappedCollectSet.Buf): CappedCollectSet.Buf = {
    buf.rows += other.rows
    val it = other.set.iterator()
    while (it.hasNext && buf.set.size <= cap) buf.set.add(it.next())
    buf
  }

  override def eval(buf: CappedCollectSet.Buf): Any = {
    val overflowed = buf.set.size > cap
    val arr = buf.set.toArray
    // atomic Catalyst internal values are mutually Comparable within a type
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]])
    val n = if (overflowed) math.max(buf.rows, buf.set.size.toLong) else buf.set.size.toLong
    InternalRow(n, new GenericArrayData(arr))
  }

  // partial buffers cross the exchange constantly — serialize through an
  // UnsafeProjection (the same technique Spark's own Collect aggregate uses)
  // rather than Java object streams
  @transient private lazy val bufProjection =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      Array[DataType](LongType, ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: CappedCollectSet.Buf): Array[Byte] = {
    val arr = new GenericArrayData(buf.set.toArray)
    bufProjection.apply(InternalRow(buf.rows, arr)).getBytes
  }

  override def deserialize(storage: Array[Byte]): CappedCollectSet.Buf = {
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(2)
    row.pointTo(storage, storage.length)
    val buf = new CappedCollectSet.Buf()
    buf.rows = row.getLong(0)
    val arr = row.getArray(1)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // values are views into `storage`, which this buffer owns and never
      // reuses — still copy UTF8Strings so merge targets can't alias a byte
      // array that a later pointTo could swap out
      buf.set.add(CappedCollectSet.own(arr.get(i, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedCollectSet =
    copy(child = newChildren.head)
  override def prettyName: String = "capped_collect_set"
}

object CappedCollectSet {

  /** Aggregation buffer: distinct values (bounded at cap+1 by the caller's
    * update/merge) plus a total non-null row count for the over-cap diagnostic. */
  final class Buf {
    val set = new java.util.LinkedHashSet[Any]()
    var rows = 0L
  }

  /** Values handed to `Expression.eval` may be views into reused buffers —
    * retain an owned copy (only UTF8String is buffer-backed among atomics). */
  private def own(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case other         => other
  }

  /** Column-API entry: `struct(n, ids)` per group, memory-bounded at `cap`. */
  def apply(c: Column, cap: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      new CappedCollectSet(org.apache.spark.sql.graftshim.ColumnShim.expr(c), cap)
        .toAggregateExpression())
}
