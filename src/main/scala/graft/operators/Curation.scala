package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** c70: the end-to-end corpus-curation pipeline a training-data job
  * actually runs over a raw crawl — composed entirely from the engine's
  * own operators, each stage verified separately elsewhere:
  *
  *   1. exact dedup: keeper election (min doc_id) per content hash
  *      ([[Dedup.d40ExactGroups]] semantics);
  *   2. near-dup removal: MinHash+LSH candidate pairs
  *      ([[Dedup.minhashNearDupPairsFrom]]) resolved to connected
  *      components ([[Dedup.connectedComponents]]); the keeper is the
  *      CLUSTER-global min doc_id, every other member is dropped —
  *      pairwise loser-dropping both over-deletes chains (it can drop all
  *      of B, C for A~B, B~C even though B is C's only link) and leaves
  *      no audit trail; the cluster_id makes the election explainable;
  *   3. quality gate: [[TextOps.qualityScoreExpr]] >= 0.6;
  *   4. language tag: [[TextOps.bestLangFold]] argmax.
  *
  * Every stage is md5/integer/decimal-deterministic, so the WHOLE
  * pipeline is DuckDB-expressible and hash-checked — the composition, not
  * just the stages, is verified.
  *
  * Scale shape (100 TB): stage 1 is one shuffle on the content hash;
  * stage 2 is the sub-quadratic band join (never all-pairs); the
  * anti-join against losers shuffles ids only; stages 3-4 are per-row
  * map work on the survivors. No stage broadcasts or collects the
  * corpus.
  */
object Curation {

  private val QualityFloor = 0.6

  def c70Curation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // stage 1: exact dedup with explicit min-doc_id keeper election
    val deduped = Dedup.dedupExact(
        docs.withColumn("__h", md5(col("text"))), Seq("__h"), col("doc_id"))
      .drop("__h")
    // stage 2: near-dup losers = every cluster member except the
    // cluster-global min (keeper); cluster_id comes from connected
    // components over the candidate pair list
    val losers = Dedup.connectedComponents(
        Dedup.minhashNearDupPairsFrom(deduped), "doc_a", "doc_b")
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val survivors = deduped.join(losers, Seq("doc_id"), "left_anti")
    // stages 3-4: quality gate + language tag
    survivors
      .select(col("doc_id") +: col("text") +:
        TextOps.langsSorted.map(TextOps.langScore): _*)
      .withColumn("quality_score", TextOps.qualityScoreExpr)
      .filter(col("quality_score") >= QualityFloor)
      .select(col("doc_id"),
        TextOps.bestLangFold(l => col(s"${l}_score")).as("pred_lang"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }

  val c70CurationSql: String = {
    val scoreCols = TextOps.langsSorted
      .map(l => s"    ${TextOps.langScoreSql(l)} AS ${l}_score").mkString(",\n")
    s"""WITH RECURSIVE keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |docs0 AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN keepers k ON d.doc_id = k.doc_id),
       |${Dedup.shingleCtesFrom("docs0")},
       |${Dedup.minhashPairCtes},
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM nd_pairs
       |  UNION SELECT doc_b, doc_a FROM nd_pairs),
       |reach(id, r) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a),
       |losers AS (
       |  SELECT id AS doc_id FROM reach GROUP BY id
       |  HAVING LEAST(id, MIN(r)) <> id),
       |survivors AS (
       |  SELECT s.doc_id, s.text FROM docs0 s
       |  WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)),
       |scored AS (
       |  SELECT doc_id, text,
       |$scoreCols,
       |    ${TextOps.qualityScoreSqlExpr} AS quality_score
       |  FROM survivors)
       |SELECT doc_id, ${TextOps.bestLangFoldSql} AS pred_lang, quality_score
       |FROM scored
       |WHERE quality_score >= $QualityFloor
       |ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("c70_curation", c70Curation _, c70CurationSql),
  )
}
