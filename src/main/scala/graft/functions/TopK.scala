package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-state grouped top-k: keep the k LARGEST struct values (by the
  * struct's lexicographic field order) seen per group, as a
  * TypedImperativeAggregate.
  *
  * This is the windowless form of `row_number() OVER (... ORDER BY ...)
  * <= k`: a window must shuffle and SORT every row of every group, while
  * an aggregate keeps k rows of state per group and — decisively at
  * 100 TB — combines MAP-SIDE, so the exchange carries at most
  * tasks × groups × k rows instead of the full table. The ranking
  * semantics stay identical because the struct embeds the tie-break
  * (e.g. (value, −id): value desc, then id asc).
  *
  * State is an unsorted k-bounded buffer (k is single-digit here;
  * linear replace-the-min beats heap constants). Spark plans this as
  * ObjectHashAggregate with partial_topk → topk (spec-asserted).
  * Serialization is length-prefixed UnsafeRow bytes. */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, "top_k requires k > 0")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_structs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!child.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k expects a struct child, got ${child.dataType.sql}")
    else TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.ArrayBuffer[InternalRow] =
    mutable.ArrayBuffer.empty[InternalRow]

  private def insert(buf: mutable.ArrayBuffer[InternalRow],
                     row: InternalRow): Unit = {
    if (buf.length < k) { buf += row; return }
    // replace the current minimum if the candidate beats it
    var minIdx = 0
    var i = 1
    while (i < buf.length) {
      if (ordering.compare(buf(i), buf(minIdx)) < 0) minIdx = i
      i += 1
    }
    if (ordering.compare(row, buf(minIdx)) > 0) buf(minIdx) = row
  }

  override def update(buf: mutable.ArrayBuffer[InternalRow],
                      input: InternalRow): mutable.ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[InternalRow],
                     other: mutable.ArrayBuffer[InternalRow])
      : mutable.ArrayBuffer[InternalRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(
      buf.sortWith((a, b) => ordering.compare(a, b) > 0).toArray)

  override def serialize(buf: mutable.ArrayBuffer[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(structType)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { row =>
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}

object TopK {
  import org.apache.spark.sql.graftops.ColumnBridge

  /** Aggregate Column: the k largest values of the struct `e` per group,
    * descending (lexicographic struct order — put the sort key first and
    * negate fields that should rank ascending). */
  def top_k(e: Column, k: Int): Column =
    ColumnBridge.column(
      TopKStructs(ColumnBridge.expression(e), k).toAggregateExpression())
}
