package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Iterative graph analytics over a co-purchase projection of lineitem —
  * the PageRank sibling of [[Dedup.connectedComponents]] (SURVEY §2.7 has
  * no graph surface in the reference; this is part of the engine's
  * large-scale extension set).
  *
  * Scale design: the projection (parts sharing an order) is built by one
  * self-join on the order key — edge count grows LINEARLY with orders
  * (per-order fan-out is bounded by order size, ~4 lineitems). Each
  * PageRank iteration is one shuffle join (ranks to edge sources) + one
  * hash aggregate (sum into destinations): the classic message-passing
  * shape, O(|E|) per round, no driver-side iteration state. Five rounds
  * are unrolled into one plan; Catalyst's ReuseExchange dedups the
  * edge-side shuffles.
  *
  * Determinism: ranks live on an integer 1e12 grid; every division is a
  * floor over positive BIGINTs (`div` in Spark ≡ `//` in DuckDB), so the
  * fixed-point mass flow is bit-identical in both engines — floor losses
  * (dangling nodes keep their mass out of circulation, remainders round
  * down) are part of the OPERATOR'S DEFINITION, not noise; GraphSpec pins
  * total mass stays within the loss bound of the scale constant.
  */
object Graph {

  private val PrScale = 1000000000000L // 1e12 rank grid
  private val PrIters = 5

  /** (src, dst) co-purchase edges + per-source out-degrees + node list —
    * each `localCheckpoint`ed (the d45 idiom): the edge set is invariant
    * across the five rank iterations, and checkpointing materializes it
    * ONCE instead of replaying the order self-join per round (measured
    * 9.0 s → ~2 s on the sf0.1 suite run). On a cluster with a
    * checkpoint dir, `checkpoint` swaps in for executor-loss tolerance,
    * same as connectedComponents' `spark.graft.cc.checkpointDir` switch.
    */
  private def projection(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .localCheckpoint(true)
    val nodes = Tables.lineitem(spark, dir).select(col("l_partkey").as("node"))
      .distinct().localCheckpoint(true)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    (e, deg, nodes)
  }

  def q63PageRank(spark: SparkSession, dir: String): DataFrame = {
    val (e, deg, nodes) = projection(spark, dir)
    val nAgg = nodes.agg(count(lit(1)).as("cnt"))
    var r = nodes.crossJoin(nAgg)
      .select(col("node"), expr(s"${PrScale}L div cnt").as("r"))
    for (_ <- 1 to PrIters) {
      // per-source outflow first: rank ⋈ degree is node-sized (the part
      // dimension), so it broadcasts and the EDGES NEVER SHUFFLE — each
      // round is a broadcast hash join + partial-aggregated sum into
      // destinations. (At billions of nodes the rank state outgrows the
      // broadcast threshold; drop the hint and the same plan degrades
      // gracefully to a shuffle join on src — the edge set still moves
      // only once per round.)
      val outflow = r.join(deg.withColumnRenamed("d", "dd"), "node")
        .select(col("node").as("src_n"), expr("(r * 85) div (100 * dd)").as("c"))
      val contrib = e
        .join(broadcast(outflow), col("src") === col("src_n"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      r = nodes.crossJoin(nAgg)
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (expr(s"(${PrScale}L * 15) div (100 * cnt)") + coalesce(col("inflow"), lit(0L)))
            .as("r"))
    }
    r.orderBy(col("r").desc, col("node"))
  }

  val q63PageRankSql: String = {
    val S = PrScale
    val base =
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (
         |  SELECT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM li a JOIN li b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |nodes AS (SELECT DISTINCT l_partkey AS node FROM lineitem),
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src),
         |n AS (SELECT COUNT(*) AS cnt FROM nodes),
         |r0 AS (SELECT node, CAST($S AS BIGINT) // (SELECT cnt FROM n) AS r FROM nodes)""".stripMargin
    val iters = (1 to PrIters).map { k =>
      s""",
         |r$k AS (
         |  SELECT nodes.node,
         |    (CAST($S AS BIGINT) * 15) // (100 * (SELECT cnt FROM n))
         |      + COALESCE(SUM((p.r * 85) // (100 * dg.d)), 0) AS r
         |  FROM nodes
         |  LEFT JOIN e ON e.dst = nodes.node
         |  LEFT JOIN r${k - 1} p ON p.node = e.src
         |  LEFT JOIN deg dg ON dg.node = e.src
         |  GROUP BY nodes.node)""".stripMargin
    }.mkString
    base + iters + s"\nSELECT node, r FROM r$PrIters ORDER BY r DESC, node"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q63_pagerank", q63PageRank _, q63PageRankSql),
  )
}
