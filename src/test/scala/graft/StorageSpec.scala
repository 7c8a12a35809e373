package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Storage

/** Storage-layout plan shapes: partition pruning on partitioned writes,
  * exchange-free joins on bucketed tables.
  */
class StorageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("partitionBy write + selective read prunes at the partition level") {
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Storage.writePartitioned(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text")),
      path, "lang")
    // one directory per lang value on disk
    val langDirs = new java.io.File(path).listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty, s"expected lang= partition dirs, got ${langDirs.toSeq}")
    val one = Storage.readPartition(spark, path, "lang", langDirs.head.stripPrefix("lang="))
    val plan = one.queryExecution.executedPlan.toString
    // the predicate must appear as a PartitionFilter (listing-level
    // pruning), NOT as a PushedFilter/data filter on row groups
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).takeWhile(_ != ']').contains("lang"),
      s"lang predicate must prune partitions:\n$plan")
    assert(one.count() > 0)
    // pruned read returns exactly the partition's rows
    val expected = Tables.documents(spark, dir)
      .filter(col("lang") === langDirs.head.stripPrefix("lang=")).count()
    assert(one.count() == expected)
  }

  test("bucketed tables join without any shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    // forbid broadcast so the join must be sort-merge — the point is the
    // missing ShuffleExchange, which broadcast would mask
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Storage.bucketedOrdersJoin(spark, dir, wh)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      // the join inputs come straight from bucketed scans: the ONLY
      // exchange allowed in the whole plan is the post-join aggregation's
      val joinPart = plan.split("SortMergeJoin", 2)(1)
      assert(!joinPart.contains("ShuffleExchange") && !joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and the result matches the plain (unbucketed) join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("dynamic partition pruning injects a runtime filter on the partitioned fact") {
    // the 100 TB lever on star joins over partitioned tables: a
    // selective dim filter becomes a RUNTIME partition filter on the
    // fact scan (partitions skipped at listing time, before any byte),
    // without the user naming partitions — Catalyst's DPP rule.
    val path = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Storage.writePartitioned(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars")),
      path, "lang")
    val sk = spark
    import sk.implicits._
    // the dim must be a real datasource: an in-memory Seq folds the
    // region filter into the LocalRelation and DPP sees no selective
    // predicate on the filtering side
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("en", "west"), ("fr", "west"), ("de", "east"),
      ("es", "east"), ("zh", "east")).toDF("lang", "region")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // the DPP rule's cost heuristic skips kilobyte-sized facts; lift the
    // benefit estimate so the test-scale plan shows the production shape
    val saved = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "50000")
    try {
      val q = spark.read.parquet(path)
        .join(dim.filter(col("region") === "west"), "lang")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"dim filter must reach the fact scan as a dynamic partition filter:\n$plan")
      // and the pruned result is the plain join's result
      val expected = Tables.documents(spark, dir)
        .filter(col("lang").isin("en", "fr")).count()
      assert(q.count() == expected)
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats",
        saved.getOrElse("true"))
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
  }

  test("zorder key interleaves bits correctly") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Storage.zorderKey(col("a"), col("b")).as("z")).collect()
      .map(_.getLong(0))
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i)))
        .reduce(_ | _)
    assert(rows.toSeq == Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .map { case (a, b) => morton(a, b) })
    // the key is monotone in the rectangle sense: (0,0) < everything else
    assert(rows(0) == 0L && rows(4) == (1L << 32) - 1)
  }

  test("zorder layout bounds BOTH key ranges per file; linear sort only one") {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val zPath = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linPath = java.nio.file.Files.createTempDirectory("graft_linear").toString
    Storage.writeZOrdered(li, zPath, "l_partkey", "l_suppkey", files = 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linPath)
    def fileWidths(path: String, key: String): Seq[Long] =
      new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(min(col(key)), max(col(key))).collect()(0)
          r.getLong(1) - r.getLong(0)
        }
    val (gMin, gMax) = {
      val r = li.agg(min(col("l_suppkey")), max(col("l_suppkey"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val zSupp = fileWidths(zPath, "l_suppkey")
    val linSupp = fileWidths(linPath, "l_suppkey")
    assert(zSupp.size == 16 && linSupp.size == 16)
    // a partkey-sorted layout leaves suppkey unclustered: every file
    // spans ~the whole suppkey range
    assert(linSupp.forall(_ > (gMax - gMin) * 9 / 10),
      s"linear layout should NOT cluster suppkey: $linSupp")
    // the z-order layout bounds the same dimension: average per-file
    // width is a fraction of the global range (each file is a rectangle
    // — 16 files fix the top 2 grid bits of EACH dim, ~1/4 range)
    assert(zSupp.sum / zSupp.size < (gMax - gMin) / 2,
      s"zorder files must cover narrow suppkey rectangles: $zSupp vs range ${gMax - gMin}")
    // ...while still bounding partkey too (what linear sorting gives up
    // on the trailing dim, z-order keeps on BOTH)
    val zPart = fileWidths(zPath, "l_partkey")
    val (pMin, pMax) = {
      val r = li.agg(min(col("l_partkey")), max(col("l_partkey"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(zPart.sum / zPart.size < (pMax - pMin) / 2,
      s"zorder files must bound partkey as well: $zPart vs range ${pMax - pMin}")
    // and both layouts hold the full row set
    assert(spark.read.parquet(zPath).count() == li.count())
  }
}
