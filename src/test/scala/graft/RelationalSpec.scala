package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("every relational query runs and has a stable schema") {
    Relational.defs.foreach { d =>
      val df = d.fn(spark, dir)
      assert(df.columns.nonEmpty, s"${d.name} has no columns")
      df.collect() // must execute without throwing
    }
  }

  test("q1 groups by the two flag columns and sums are positive") {
    val rows = Relational.q1PricingSummary(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 9) // |returnflag| x |linestatus|
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q2 revenue-by-nation covers every nation with lineitems") {
    val rows = Relational.q2RevenueByNation(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3 semi join never exceeds total order count") {
    val total = Tables.orders(spark, dir).count()
    val semi = Relational.q3SemiJoin(spark, dir)
      .agg(sum("n_orders")).collect()(0).getLong(0)
    assert(semi <= total && semi > 0)
  }

  test("q4 anti join complements the semi join on the same predicate") {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi == c.count())
  }

  test("q5 emits at most 3 rows per customer, ranked") {
    val byCust = Relational.q5WindowTopN(spark, dir)
      .groupBy("o_custkey").count().collect()
    assert(byCust.forall(_.getAs[Long]("count") <= 3))
  }

  test("q6 running window final value equals the group sum") {
    val last = Relational.q6RunningWindow(spark, dir)
      .groupBy("l_suppkey").agg(max("running_qty").as("final_running"))
    val direct = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(30,2)")).cast("double").as("direct_sum"))
    val joined = last.join(direct, "l_suppkey")
      .filter(abs(col("final_running") - col("direct_sum")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("q7 returns exactly 10 rows in descending price order") {
    val prices = Relational.q7TopK(spark, dir).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q8 set-op branches partition the distinct custkey universe") {
    val rows = Relational.q8SetOps(spark, dir)
    // a key appears at most once per tag, and 'both' keys never appear in only_* branches
    val dupes = rows.groupBy("tag", "o_custkey").count().filter(col("count") > 1)
    assert(dupes.count() == 0)
    val perKeyTags = rows.groupBy("o_custkey").agg(collect_set("tag").as("tags")).collect()
    perKeyTags.foreach { r =>
      val tags = r.getAs[scala.collection.Seq[String]]("tags")
      assert(tags.size == 1, s"custkey in multiple set-op branches: $tags")
    }
  }

  test("q18 five-way join: part filter reaches the part scan, totals reconcile") {
    val q18 = Relational.q18ProfitByNationYear(spark, dir)
    val rows = q18.collect()
    assert(rows.nonEmpty)
    // n_items summed over groups == filtered join cardinality
    val joined = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_size") < 25), col("l_partkey") === col("p_partkey"))
      .count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == joined)
    // the p_size predicate is pushed down to the part parquet scan
    val plan = q18.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(p_size,25)"), "p_size filter not pushed to scan")
  }

  test("double-sum default and decimal oracle-parity mode agree at the cents boundary") {
    def run() = Relational.q1PricingSummary(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val dbl = run()
    sys.props("graft.sums") = "decimal"
    val dec = try run() finally sys.props.remove("graft.sums")
    assert(dbl.keySet == dec.keySet)
    for ((k, d) <- dbl; e = dec(k);
         c <- Seq("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge")) {
      // double mode rounds to cents; decimal mode is exact at `scale` —
      // they must agree within half a cent
      assert(math.abs(d.getAs[Double](c) - e.getAs[Double](c)) <= 0.005 + 1e-9,
        s"$k.$c: double=${d.getAs[Double](c)} decimal=${e.getAs[Double](c)}")
    }
  }

  test("q9 rollup grand-total row equals table count") {
    val total = Tables.lineitem(spark, dir).count()
    val all = Relational.q9Rollup(spark, dir)
      .filter(col("rf") === "ALL" && col("ls") === "ALL").collect()
    assert(all.length == 1 && all(0).getAs[Long]("n") == total)
  }

  test("q10 cube contains all four grouping combinations") {
    val df = Relational.q10Cube(spark, dir)
    val combos = df.select(
      (col("status") === "ALL").as("sAll"), (col("priority") === "ALL").as("pAll"))
      .distinct().count()
    assert(combos == 4)
  }

  test("q11 approx distinct: exact counts match and 3σ-bound flags hold") {
    val approx = Relational.q11ApproxDistinct(spark, dir).collect()
    val exact = Tables.lineitem(spark, dir).groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("e1"), countDistinct("l_partkey").as("e2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    approx.foreach { r =>
      val (e1, e2) = exact(r.getString(0))
      assert(r.getAs[Long]("n_orders_exact") == e1)
      assert(r.getAs[Long]("n_parts_exact") == e2)
      assert(r.getAs[Long]("orders_within_15pct") == 1L)
      assert(r.getAs[Long]("parts_within_15pct") == 1L)
    }
  }

  test("q11c runs as one bounded-state aggregate, not a rank window") {
    val plan = Relational.q11cKmvDistinct(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "q11c must not sort/rank distinct hashes")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "kmv_distinct should run as an imperative aggregate")
  }

  test("q11c KMV sketch estimates distinct orders within 25% of exact") {
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Relational.q11cKmvDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    assert(est.keySet == exact.keySet)
    for ((k, e) <- est) {
      val x = exact(k).toDouble
      // KMV with k=64: relative sd ~ 1/sqrt(k-2) ≈ 13%; 25% is ~2σ
      assert(math.abs(e - x) / x <= 0.25, s"$k: est=$e exact=$x")
    }
  }

  test("q36 salted aggregation fans hot keys over salt buckets, two exchange levels") {
    val q36 = Relational.q36SaltedAgg(spark, dir)
    // counts reconcile with the direct aggregate
    val direct = Tables.events(spark, dir).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = q36.collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(salted == direct)
    // the plan carries BOTH aggregation levels: a (key, salt) exchange
    // fanning each hot key out, then the per-key merge
    val plan = q36.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salted phase missing from the plan")
    assert("hashpartitioning\\(event_type[#0-9L]*, __salt".r.findFirstIn(plan).isDefined,
      s"no (key, salt) exchange in plan")
  }

  test("q12 hourly buckets sum to the events row count") {
    val total = Tables.events(spark, dir).count()
    val bucketed = Relational.q12HourlyEvents(spark, dir)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(bucketed == total)
  }

  test("q15 range-join counts are bounded by per-order lineitem counts") {
    val perOrder = Tables.lineitem(spark, dir).groupBy(col("l_orderkey").as("o_orderkey")).count()
    val bad = Relational.q15RangeJoin(spark, dir)
      .join(perOrder, "o_orderkey")
      .filter(col("n_shipped_30d") > col("count"))
    assert(bad.count() == 0)
  }

  test("q69 plans a null-aware anti join and honors 3-valued NOT IN semantics") {
    val df = Relational.q69NullAwareAnti(spark, dir)
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val naaj = executed.collect {
      case j: BroadcastHashJoinExec if j.isNullAwareAntiJoin => j
    }
    assert(naaj.nonEmpty, s"expected a null-aware anti join in:\n$executed")
    // probe-side NULL rows (custkey 13 masked) must be DROPPED, not kept:
    // total q69 orders < plain left_anti count whenever custkey 13 ordered
    val nullAware = df.agg(sum("n_orders")).head().getLong(0)
    val building = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val plainAnti = Tables.orders(spark, dir)
      .join(building, col("o_custkey") === col("c_custkey"), "left_anti").count()
    val cust13Orders = Tables.orders(spark, dir).where(col("o_custkey") === 13).count()
    val cust13IsBuilding = building.where(col("c_custkey") === 13).count() > 0
    // NOT IN drops the masked rows; left_anti keeps custkey-13 rows unless
    // 13 itself is in the build set
    val expected = if (cust13IsBuilding) plainAnti else plainAnti - cust13Orders
    assert(nullAware == expected,
      s"null-aware total $nullAware vs expected $expected (left_anti $plainAnti)")
  }

  test("q69: a NULL in the build side empties the result entirely") {
    import spark.implicits._
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Seq(Some(1L), None).toDF("c_custkey").createOrReplaceTempView("nullish")
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM nullish)")
      .head().getLong(0)
    assert(n == 0, s"NOT IN over a null-bearing set must be empty, got $n")
  }
}
