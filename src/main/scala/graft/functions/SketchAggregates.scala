package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Sketch aggregation functions as `TypedImperativeAggregate`s — the
  * Catalyst API for aggregates whose buffer is an opaque mutable object
  * (here primitive arrays) rather than a fixed row of columns.
  *
  * Why not K separate `min(...)`/`sum(when(...))` agg columns (the pure-
  * expression formulation they replace): K=32..64 generated aggregate
  * expressions bloat codegen and evaluate K hash expressions per input
  * row; one imperative buffer does the K-loop in tight JVM code with a
  * single pass over the input — measured ~2× on the sf0.1 dedup bench.
  * The buffer serializes to bytes for shuffle (partial aggregation still
  * applies: updates happen map-side, merges combine per-key buffers).
  */

/** K-wise MinHash signature over a Long input column: for each k,
  * min((a_k·x + b_k) mod p). Returns array<bigint> of length K.
  * Inputs must already be in [0, p) — overflow-free for p < 2^31. */
case class MinHashSketch(
    child: Expression,
    a: Array[Long], b: Array[Long], p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val k = a.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val h = (a(i) * x + b(i)) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sketch"
  override def withNewMutableAggBufferOffset(o: Int): MinHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSketch =
    copy(child = c.head)
}

/** 64-bit SimHash over a Long hash input: per bit, count(+1 if set else
  * −1); final bit = count > 0. Returns the packed Long signature. */
case class SimHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((x >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_sketch"
  override def withNewMutableAggBufferOffset(o: Int): SimHashSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashSketch =
    copy(child = c.head)
}

object SketchAggregates {
  def minhashSketch(x: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    bridge.columnOf(
      MinHashSketch(bridge.exprOf(x), a, b, p).toAggregateExpression())

  def simhashSketch(x: Column): Column =
    bridge.columnOf(SimHashSketch(bridge.exprOf(x)).toAggregateExpression())
}
