package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native typed
  * imperative aggregate — the PRODUCTION shape of the estimator behind
  * q11c (Bar-Yossef et al.: est = (k-1)/u_k over the k smallest distinct
  * hash values; exact count when fewer than k distinct hashes exist).
  *
  * The input is an already-hashed BIGINT column (the engine's portable
  * md5-60-bit hash, so the estimate is bit-deterministic across engines —
  * unlike HLL, whose sketch layout is implementation-defined). The buffer
  * is a bounded sorted set of ≤ k longs: one hash-aggregate pass with
  * map-side partial combine, O(k) state per group, no per-group sort of
  * all distinct hashes — at 100 TB this replaces q11c's gate-shaped
  * rank-window (which shuffles and sorts every distinct hash) with a
  * single aggregation whose merge is a k-way set union.
  *
  * Returns `struct<n_mins: bigint, est: double>`: `n_mins` = number of
  * retained hashes (= distinct count when < k), `est` the estimate.
  * Commutative and associative — partition order cannot change the k
  * smallest of a set — so no rounding is needed for oracle parity.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    hashSpaceBits: Int = 60,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "KMV needs k >= 2")
  // 1L << 63 is Long.MinValue and 1L << 64 wraps to 1 — either silently
  // destroys the estimate's denominator in eval(), so bound the shift.
  require(hashSpaceBits >= 1 && hashSpaceBits <= 62,
    s"KMV hashSpaceBits must be in [1, 62], got $hashSpaceBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_mins", LongType, nullable = false),
    StructField("est", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // keep only candidates for the k smallest; TreeSet dedups re-adds
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size.toLong
    val est =
      if (n < k) n.toDouble
      else (k - 1).toDouble / (buf.last().toDouble / (1L << hashSpaceBits).toDouble)
    InternalRow(n, est)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}
