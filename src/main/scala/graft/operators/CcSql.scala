package graft.operators

/** Shared DuckDB-oracle SQL for connected components: an unrolled
  * FastSV-style stage chain, replacing the `WITH RECURSIVE` transitive
  * closure that every cluster-shaped oracle (d45/d63/d66, d65/d68,
  * m66/m70/m71) used through round 16. The closure materializes
  * O(Σ component²) reachability pairs — fine at the gate SFs, >20 min at
  * sf1's 20k vectors and 13s per query at sf0.1 (VERDICT r16 items 1+5).
  *
  * Each stage, from the previous labeling `l<k-1>(id, l)`:
  *  1. '''hook''' (`h<k>`): every tree root takes the min label proposed
  *     across ALL its members' edges — aggregation keyed by CURRENT
  *     LABEL, not adjacency, so whole basins merge per round. Plain
  *     neighbor-min (even with self-pointer-jumping) provably stalls at
  *     local-minimum plateaus: the global min crosses a neighboring
  *     basin one hop per round, making rounds ~ eccentricity.
  *  2. '''neighbor-min''' (`a<k>`): one adjacency sweep.
  *  3. '''pointer jump ×4''' (`j<k>`, `l<k>`): two label-of-label
  *     compositions each, compressing hook chains.
  *
  * Measured convergence: 3-4 rounds on the real mutual-kNN graphs
  * (sf0.001-0.1), 8 on an adversarial 20k-node shuffled-id path; the
  * default 12 carries margin. Convergence is machine-checked by the gate
  * itself: an unconverged label hash-mismatches Spark's exact
  * [[Dedup.connectedComponents]] output.
  *
  * Every stage is `AS MATERIALIZED` — DuckDB's default CTE inlining
  * would otherwise re-expand the chain per reference (the r15 t98
  * lesson; each stage references its predecessor 3-4 times).
  */
private[graft] object CcSql {

  /** Default stage count — see convergence notes above. */
  val Rounds = 12

  /** CTE chain fragment (no leading WITH, no trailing comma): reads a
    * symmetric edge CTE `edges(a, b)` already in scope and emits
    * `l0 .. l<rounds>` plus a convergence-guarded final labeling; final
    * labels live in [[labels]]`(rounds)` — one row per node appearing in
    * `edges`, `l` = min id of the node's component. Singleton nodes (no
    * edges) don't appear; callers COALESCE to self-labels, as the Spark
    * side does.
    *
    * Convergence sentinel (ADVICE r17): the fixed unroll has no in-SQL
    * convergence assertion, so a depth shortfall at a larger/adversarial
    * SF would surface as an opaque value mismatch against Spark — looking
    * like an engine bug rather than an oracle-depth shortfall. `cv<r>`
    * counts labels that still changed in the LAST round (hook/min/jump
    * are deterministic functions of the labeling, so an unchanged round
    * is a fixed point); the guarded final CTE raises a self-describing
    * `error(...)` when that count is nonzero. DuckDB evaluates the CASE
    * branch lazily (verified v1.0.0), so a converged run never touches
    * the error path.
    */
  def stages(rounds: Int = Rounds): String = {
    val chain = (1 to rounds).map { k =>
      val prev = s"l${k - 1}"
      s"""h$k AS MATERIALIZED (
         |  SELECT pa.l AS r, MIN(pb.l) AS m
         |  FROM edges e
         |  JOIN $prev pa ON pa.id = e.a
         |  JOIN $prev pb ON pb.id = e.b
         |  GROUP BY pa.l),
         |n$k AS MATERIALIZED (
         |  SELECT n.id, LEAST(n.l, COALESCE(h.m, n.l)) AS l
         |  FROM $prev n LEFT JOIN h$k h ON h.r = n.l),
         |a$k AS MATERIALIZED (
         |  SELECT n.id, LEAST(n.l, MIN(m.l)) AS l
         |  FROM n$k n
         |  JOIN edges e ON e.a = n.id
         |  JOIN n$k m ON m.id = e.b
         |  GROUP BY n.id, n.l),
         |j$k AS MATERIALIZED (
         |  SELECT u.id, w.l FROM a$k u JOIN a$k w ON w.id = u.l),
         |l$k AS MATERIALIZED (
         |  SELECT u.id, w.l FROM j$k u JOIN j$k w ON w.id = u.l)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (
       |  SELECT a AS id, LEAST(a, MIN(b)) AS l FROM edges GROUP BY a),
       |$chain,
       |cv$rounds AS MATERIALIZED (
       |  SELECT COUNT(*) AS n FROM l${rounds - 1} p
       |  JOIN l$rounds q ON q.id = p.id AND q.l <> p.l),
       |lf$rounds AS MATERIALIZED (
       |  SELECT id, CASE WHEN (SELECT n FROM cv$rounds) > 0
       |    THEN CAST(error('CcSql: labels not converged after $rounds rounds - raise CcSql.Rounds') AS BIGINT)
       |    ELSE l END AS l
       |  FROM l$rounds)""".stripMargin
  }

  /** Name of the convergence-guarded final labeling CTE for
    * [[stages]]`(rounds)`. */
  def labels(rounds: Int = Rounds): String = s"lf$rounds"
}
