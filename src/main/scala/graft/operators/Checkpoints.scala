package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Constraint-shedding checkpoint for incremental folds' persisted state
  * (d64, m70).
  *
  * `localCheckpoint` copies the source plan's attribute-level constraints
  * into the LogicalRDD, but Catalyst's relation dedup re-instances a
  * LogicalRDD that appears in two plan positions (or whose attribute ids
  * collide across union children) WITHOUT remapping those origin
  * constraints — the union constraint rewrite then crashes on the stale
  * ids (`key not found: vec_id#N`). The typed identity map inserts a
  * serialize boundary that mints fresh attribute ids per call and sheds
  * every filter-derived constraint (only nullability-derived isnotnull
  * of the frame's own outputs can remain), so the frozen state frame can
  * be unioned and self-joined freely across advances — union children
  * stay id-distinct, so re-instancing never rewrites their constraints.
  * The row round-trip is paid ONCE per advance, at checkpoint
  * materialization, on state that is orders smaller than the corpus.
  * (d63's band index dodges the same trap only because its
  * aggregate/generate outputs happen to carry no constraints.)
  * Round14Spec pins the contract.
  */
object Checkpoints {
  private[graft] def fresh(df: DataFrame, names: String*): DataFrame = {
    val pruned = df.select(names.map(col): _*)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(pruned.schema)
    pruned.map(identity).localCheckpoint(true)
  }
}
