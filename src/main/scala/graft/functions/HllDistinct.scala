package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Mergeable HyperLogLog distinct-count sketch as a custom
  * `TypedImperativeAggregate` — the §2.12 custom-aggregate surface the
  * earlier rounds deferred (built-in `approx_count_distinct` covers the
  * estimate; this demonstrates the full partial → serialize → shuffle →
  * merge → final sketch lifecycle that a 100 TB rollup pipeline relies on:
  * per-partition sketches are fixed-size byte arrays that merge by
  * element-wise max, so the reduce side moves 4 KB per group instead of the
  * distinct keys themselves).
  *
  * Layout: standard HLL with p=12 → m=4096 single-byte registers
  * (~1.04/√m ≈ 1.6 % standard error). Values hash through xxhash64
  * (seed 42); register index = top p hash bits, register value = rank
  * (leading-zero count + 1) of the remaining 52 bits, capped at 53 — fits a
  * byte. Estimate = bias-corrected harmonic mean with the standard
  * linear-counting fallback for the small range. Deterministic for a given
  * input multiset: update/merge are commutative element-wise max, so the
  * result is partitioning-invariant (asserted by ExpressionSpec).
  */
case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val P = 12
  private val M = 1 << P

  override def prettyName: String = "graft_hll_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - P)).toInt
      val rest = h << P
      val rank =
        if (rest == 0L) (64 - P + 1) else java.lang.Long.numberOfLeadingZeros(rest) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M * M / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}
