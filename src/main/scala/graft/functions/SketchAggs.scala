package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native imperative aggregate.
  *
  * The classic streaming heavy-hitters sketch (Misra & Gries 1982), in the
  * MERGEABLE form of Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * a summary of at most `capacity` counters per partition, merged pairwise
  * by summing counters and then subtracting the (capacity+1)-th largest
  * count from every survivor. The merged summary retains EVERY item whose
  * true frequency exceeds N/(capacity+1) — regardless of row order or
  * partitioning — which is exactly the guarantee a two-pass exact heavy-
  * hitters query needs for its pruning pass (see TextStats.heavyHitters).
  *
  * Scale shape: the full token stream is reduced map-side to a
  * `capacity`-bounded summary per partition; only these tiny summaries
  * move in the final-merge exchange. The alternative — groupBy(token)
  * .count over the raw stream — shuffles the whole distinct token space.
  *
  * The candidate SET is order-dependent between the guaranteed survivors
  * and the noise floor (standard for MG); callers must treat the output
  * as a superset of the true heavy hitters and verify with exact counts.
  * Output is the candidate tokens sorted in binary order.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"misra_gries capacity must be >= 1, got $capacity")

  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a string token column, got " +
          child.dataType.simpleString)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val tok = v.asInstanceOf[UTF8String]
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + 1L)
      case None if buf.size < capacity =>
        // clone: Spark reuses the UnsafeRow backing memory across rows
        buf.update(tok.clone(), 1L)
      case None =>
        // decrement-all step; drops zeros (amortized O(1) per input row)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.mapValuesInPlace((_, c) => c - sub)
      a.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val arr = buf.keysIterator.toArray
    java.util.Arrays.sort(arr, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object SketchAggs {
  /** Column face of [[MisraGries]]; `capacity` must be a positive literal. */
  def misraGries(tok: Column, capacity: Int): Column =
    call_function("misra_gries", tok, lit(capacity))
}
