package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvDistinct

/** Property tests for the KMV sketch's aggregation algebra: for ANY
  * input, ANY chunking into partial buffers, ANY merge order, and a
  * serialization roundtrip per partial, the result must equal the
  * estimator computed directly from the k smallest distinct values —
  * the algebraic fact (k-smallest-of-a-set is order-insensitive) that
  * makes q11c's estimate deterministic under Spark's partial/final
  * aggregation and hash-comparable against the DuckDB oracle.
  */
class KmvPropertySpec extends AnyFunSuite {

  private def agg(k: Int) =
    KmvDistinct(BoundReference(0, LongType, nullable = true), k)

  private def direct(vals: Seq[Long], k: Int): (Long, Double) = {
    val d = vals.distinct.sorted.take(k)
    val n = d.size.toLong
    val est =
      if (n < k) n.toDouble
      else (k - 1).toDouble / (d.last.toDouble / (1L << 60).toDouble)
    (n, est)
  }

  test("chunked update + merge + serde roundtrip ≡ direct estimator, any order") {
    val gen = for {
      vals <- Gen.listOf(Gen.chooseNum(0L, 1L << 60))
      k <- Gen.chooseNum(2, 16)
      nChunks <- Gen.chooseNum(1, 5)
    } yield (vals, k, nChunks)
    val prop = Prop.forAll(gen) { case (vals, k, nChunks) =>
      val a = agg(k)
      val chunks =
        if (vals.isEmpty) Seq(Seq.empty[Long])
        else vals.grouped(math.max(1, vals.size / nChunks)).toSeq
      val partials = chunks.map { c =>
        c.foldLeft(a.createAggregationBuffer()) { (b, v) =>
          a.update(b, InternalRow(v))
        }
      }
      // reverse merge order stresses commutativity; serde each partial
      val merged = partials.map(b => a.deserialize(a.serialize(b)))
        .reverse
        .reduce((x, y) => a.merge(x, y))
      val row = a.eval(merged).asInstanceOf[InternalRow]
      val (n, est) = direct(vals, k)
      row.getLong(0) == n && row.getDouble(1) == est
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("constructor rejects k < 2 and hashSpaceBits outside [1, 62]") {
    val child = BoundReference(0, LongType, nullable = true)
    intercept[IllegalArgumentException](KmvDistinct(child, 1))
    // 1L << 63 is Long.MinValue and 1L << 64 wraps to 1 — both would
    // silently corrupt the estimate denominator if allowed through
    intercept[IllegalArgumentException](KmvDistinct(child, 64, hashSpaceBits = 63))
    intercept[IllegalArgumentException](KmvDistinct(child, 64, hashSpaceBits = 0))
    KmvDistinct(child, 64, hashSpaceBits = 62) // boundary accepted
    ()
  }

  test("null inputs are ignored, duplicates count once") {
    val a = agg(4)
    val b = Seq[Any](7L, null, 7L, 9L, null, 9L, 7L)
      .foldLeft(a.createAggregationBuffer()) { (buf, v) =>
        a.update(buf, InternalRow(v))
      }
    val row = a.eval(b).asInstanceOf[InternalRow]
    assert(row.getLong(0) == 2L && row.getDouble(1) == 2.0)
  }
}
