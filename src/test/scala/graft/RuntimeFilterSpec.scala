package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for Spark's runtime row-level filtering (InjectRuntimeFilter):
  * on a shuffle join whose build side carries a selective predicate, the
  * optimizer plants a bloom-filter aggregate on the build side and a
  * `might_contain` probe on the probe side's scan — so at 100 TB the fact
  * scan discards non-joining rows BEFORE the shuffle instead of shipping
  * them to the join. This is the automatic sibling of the explicit
  * pre-filter patterns (broadcast semi-join in q3, partition pruning in
  * StorageSpec): users of the engine get it from configuration, not code,
  * which is why it's pinned here as a plan-level contract.
  *
  * The thresholds exist because the filter is a wager (build-side scan +
  * bloom build vs probe-side rows saved): production defaults demand a
  * 10 GB probe side; the spec lowers them to make the wager taken on
  * test-sized data, exactly as AqeSkewSpec does for the skew detector.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom runtime filter on the fact scan side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // defaults demand a 10 GB application-side scan; the semantics
      // under test are injection + correctness, not the cost model
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join — a broadcast join already co-locates the
      // dim and gets no bloom filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def joined = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
      val q = joined
      val expected = q.count()
      assert(expected > 0)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.toLowerCase.contains("bloomfilter"),
        s"expected a bloom runtime filter in the optimized plan:\n$optimized")
      // the filter is a pure pushdown: result identical with it disabled
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(joined.count() == expected)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
