package graft.operators

import org.apache.spark.sql.DataFrame

/** Conf-switched strategy hint for the candidate-generation equi-joins
  * (band/bucket/cell/prefix joins in [[Dedup]] and [[Similarity]]).
  *
  * Through round 17 these eight sites carried a frozen `shuffle_hash`
  * hint (rationale: a corpus self-join must never broadcast, and the
  * build side is bounded). d43's 4-cell profile (idle / 16-spinner /
  * 32-spinner × hint / none, BASELINE.md round-17 table) showed AQE at
  * least as fast in EVERY cell — a frozen hint also disables AQE's
  * runtime join-strategy switch (broadcast when a capped band side turns
  * out small, sort-merge when the hash side would spill, skew-split when
  * a bucket runs hot), which is exactly the machinery a 1000-executor
  * run wants making the call per-stage. Round 18 swept the remaining
  * sites with the same method plus an IO-co-tenant cell (BASELINE.md
  * round-18 table): AQE within noise or faster at every site EXCEPT
  * d41's shingle self-join — the one join whose build side is a ~260k-row
  * highly-duplicated shingle table, where the hinted hash join skips the
  * sort that sort-merge pays on both duplicated sides; d41's hint won
  * every paired measurement in every cell (~15-25%), so that site keeps
  * `shuffle_hash` as its per-site default. All other sites default to
  * AQE. `spark.graft.candidateJoinHint` overrides every site either way
  * (`shuffle_hash` reproduces the old plans, `none` forces pure AQE).
  *
  * Oracle safety: every affected query (d41/d42/d48/d55/d57/d63/d64/
  * d66/d67/q31 + the c7x/m7x compositions) has a hash-grade DuckDB
  * oracle, so plan-sensitive drift cannot land silently.
  */
private[operators] object CandidateJoin {
  private val Key = "spark.graft.candidateJoinHint"

  def hinted(df: DataFrame, default: String = "none"): DataFrame =
    df.sparkSession.conf.getOption(Key).getOrElse(default) match {
      case "none" => df
      case h => df.hint(h)
    }
}
