package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** c84 compaction planner: the next-fit-by-formula assignment against a
  * naive recompute, its structural invariants (contiguous runs, conserved
  * mass, bounded task count and overshoot), and an exact planted case.
  */
class CompactionPlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  private def plan() = Curation.c84CompactionPlan(spark, dir).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)))

  test("c84 matches a naive formula recompute; mass conserved; runs contiguous") {
    val got = plan()
    val months = got.map(m => (m._1, m._2)).sortBy(_._1)
    val total = months.map(_._2).sum
    val target = (total + 15) / 16
    var cum = 0L
    val naive = months.map { case (m, n) =>
      val t = cum / target
      cum += n
      (m, n, t)
    }
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == naive.toSeq)
    // tasks are contiguous month runs
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
    // per-task rollups are consistent and conserve the corpus
    val byTask = got.groupBy(_._3)
    for ((t, rows) <- byTask) {
      assert(rows.forall(_._4 == rows.length.toLong), s"task $t task_parts")
      assert(rows.forall(_._5 == rows.map(_._2).sum), s"task $t task_rows")
      // next-fit overshoot bound: a task exceeds the target only by
      // (part of) its last partition
      assert(rows.map(_._2).sum < target + rows.map(_._2).max, s"task $t bound")
    }
    assert(byTask.values.map(_.map(_._2).sum).sum == total)
    assert(got.map(_._3).forall(t => t >= 0L && t < 16L))
  }

  test("c84 planted equal partitions fill every task exactly") {
    val s = spark; import s.implicits._
    val parts = (0 until 32).map(i => (f"2020-$i%02d", 10L)).toDF("month", "n_rows")
    val got = Curation.compactionPlanFrom(parts).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // total 320, target 20 → 16 tasks of exactly two 10-row partitions
    assert(got.length == 32)
    for ((m, t, parts_, rows, fill) <- got) {
      assert(t == m.drop(5).toLong / 2, s"$m task")
      assert(parts_ == 2L && rows == 20L && fill == 1.0, s"$m rollup")
    }
  }
}
