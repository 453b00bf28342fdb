package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded KMV (k-minimum-values) sketch buffer: the k smallest
  * DISTINCT strings seen, kept in a balanced tree. Memory is O(k)
  * per group regardless of input cardinality — the property that
  * makes the sketch viable where an exact distinct would shuffle
  * every key. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[String]()
  def insert(s: String): Unit =
    if (set.size < k) { set.add(s); () }
    else if (s.compareTo(set.last) < 0) {
      if (set.add(s)) { set.pollLast(); () }
    }
}

/** Native KMV distinct-count sketch aggregate: returns the (≤ k)
  * smallest distinct values of `child` (a uniformly-distributed hash
  * string — pass `md5(...)`) in ascending order.
  *
  * Unlike HyperLogLog, the KMV sketch is PORTABLE: "the k smallest
  * md5 digests" is engine-independent, so any system that can sort
  * strings computes the identical sketch and the identical estimate
  * n ≈ (k−1)/frac(h_k) — which makes the approximate-distinct path
  * oracle-checkable bit-for-bit (the DuckDB gate recomputes it with a
  * window function). Fixed-width lowercase hex makes lexicographic
  * order = numeric order.
  *
  * Estimation (Bar-Yossef et al. 2002, "Counting distinct elements in
  * a data stream"): with fewer than k distinct values the sketch IS
  * the exact distinct set; otherwise the k-th minimum's position
  * estimates density. See [[Kmv.kmvEstimate]] for the column-level
  * estimator.
  */
case class KmvDigests(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def prettyName: String = "kmv_digests"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.set.forEach(s => buffer.insert(s))
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val arr = new Array[Any](buffer.set.size)
    var i = 0
    val it = buffer.set.iterator()
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bytes)
    out.writeInt(buffer.set.size)
    buffer.set.forEach(s => out.writeUTF(s))
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): KmvBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val buf = new KmvBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set.add(in.readUTF()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDigests =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDigests =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvDigests =
    copy(child = newChild)
}

object Kmv {
  import org.apache.spark.sql.functions._

  /** The KMV sketch column: ascending array of the ≤ k smallest
    * distinct values of `hashCol` (pass an md5 column). */
  def kmvDigests(hashCol: Column, k: Int): Column =
    bridge.column(KmvDigests(bridge.expression(hashCol), k).toAggregateExpression())

  /** Distinct-count estimate from a [[kmvDigests]] sketch: exact when
    * the sketch holds fewer than k digests, else (k−1)/frac(h_k) with
    * frac taken from the k-th digest's first 48 bits — every step is
    * plain IEEE double arithmetic any engine reproduces bit-for-bit
    * (one exact power-of-two division, one rounded division). */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (conv(substring(element_at(sketch, k), 1, 12), 16, 10)
          .cast("long").cast("double") / pow(lit(2.0), lit(48))))
}
