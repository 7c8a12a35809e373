package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** c73 data-quality audit: the report's counters must match naive
  * recomputations, the pass flags must be consistent, and the check set
  * must exercise BOTH outcomes on this corpus (the known lineitem
  * composite-key duplicates keep the fail path honest).
  */
class QualityAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("c73 counters match naive recomputation; flags consistent; both outcomes present") {
    val rows = Curation.c73QualityAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == 9, "nine named checks")
    assert(rows.forall { case (_, (v, n, p)) => (p == 1L) == (v == 0L) && v >= 0 && v <= n })

    val li = graft.Tables.lineitem(spark, dir)
    val nLi = li.count()
    // known synthetic-data violation: composite key duplicates exist
    val dupExtra = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .count().where(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).collect()(0).getLong(0)
    assert(dupExtra > 0, "corpus must exercise the fail path")
    assert(rows("lineitem.pk_unique") == ((dupExtra, nLi, 0L)))

    // a passing check, recomputed
    val badDisc = li.where(col("l_discount") < 0.0 || col("l_discount") > 0.1).count()
    assert(rows("lineitem.l_discount_range") == ((badDisc, nLi, if (badDisc == 0) 1L else 0L)))

    // FK checks: n_rows must be the child count (parent dup keys must not
    // inflate the joined row count)
    val nOrders = graft.Tables.orders(spark, dir).count()
    assert(rows("orders.o_custkey_fk_customer")._2 == nOrders)
    assert(rows("lineitem.l_orderkey_fk_orders")._2 == nLi)
    assert(rows.exists(_._2._3 == 1L), "at least one check passes")
  }
}
