package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Vectors

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64)
  * — the ANN extension (SURVEY.md §4.2). Two paths:
  *
  *  - q30 brute-force cosine top-k: the exact baseline. Queries are the
  *    SMALL side → broadcast; the corpus streams through the codegen'd
  *    [[graft.functions.VecCosine]] scorer — at 100 TB this is a single
  *    scan, no shuffle until the (tiny) per-query top-k reduction.
  *  - q31 random-hyperplane LSH: the sub-quadratic scale path. Sign
  *    sketches bucket the corpus; candidate generation is an equi-join
  *    on (table, bucket), exact cosine re-ranks candidates only.
  *    Recall vs q30 is pinned by SimilaritySpec.
  */
object Similarity {

  private val K = 5
  private val NumQueries = 10 // queries = vec_id < 10

  // -------------------------------------------------------------------
  // q30: exact brute-force top-k per query.
  // -------------------------------------------------------------------
  def q30AnnBrute(spark: SparkSession, dir: String): DataFrame = {
    Vectors.register(spark)
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", Vectors.vecCosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("query_id"), col("rn"), col("neighbor_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rn"))
  }

  val q30AnnBruteSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(qe, e.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
       |  FROM q CROSS JOIN embeddings e
       |  WHERE e.vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
       |  FROM scored)
       |SELECT query_id, rn, neighbor_id, ROUND(sim, 6) AS sim
       |FROM ranked
       |WHERE rn <= $K
       |ORDER BY query_id, rn""".stripMargin

  // -------------------------------------------------------------------
  // q31: LSH-bucketed ANN. `Tables`-deterministic hyperplanes (seeded),
  // NumTables independent sketches of BitsPerTable sign bits each;
  // candidates = corpus vectors sharing any (table, bucket) with the
  // query; exact cosine re-rank of candidates only. Rows-only (the
  // hyperplane constants live in the engine, not in SQL); recall is
  // pinned by SimilaritySpec.
  // -------------------------------------------------------------------
  private val NumTables = 8
  private val BitsPerTable = 6
  private val Dim = 64

  /** (tbl, bucket) rows for one embedding column: posexplode of the
    * native [[graft.functions.VecLshSketch]] (pos = table index). The
    * seeded plane matrix lives inside the expression as one reference
    * object — the previous per-plane `vec_dot(emb, lit(plane))` formulation
    * put tables×bits 64-float literals in the plan, and optimizer + codegen
    * + task-deser over those trees dominated q31's runtime (8.4 s for a
    * 2000-vector corpus).
    */
  private def bucketed(df: DataFrame, idCol: String, idAs: String, emb: Column,
                       seed: Int, tables: Int, bits: Int): DataFrame =
    df.select(col(idCol).as(idAs),
        posexplode(Vectors.vecLshSketch(emb, seed, tables, bits, Dim)))
      .select(col(idAs), col("pos").as("tbl"), col("col").as("bucket"))

  def q31AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    Vectors.register(spark)
    val e = Tables.embeddings(spark, dir)
    val corpus = e.repartition(spark.sessionState.conf.numShufflePartitions)
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // candidates carry ids only — the distinct shuffles narrow rows, and
    // the embeddings are re-attached afterwards (corpus via equi-join,
    // queries via broadcast) instead of riding through the dedup
    val corpusBuckets = bucketed(corpus, "vec_id", "neighbor_id",
      col("embedding"), 42, NumTables, BitsPerTable)
    val queryBuckets = bucketed(queries, "query_id", "query_id", col("qe"),
      42, NumTables, BitsPerTable)
    val cand = corpusBuckets.join(broadcast(queryBuckets), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .join(broadcast(queries), "query_id")
      .withColumn("sim", Vectors.vecCosine(col("qe"), col("ne")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("query_id"), col("rn"), col("neighbor_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("query_id"), col("rn"))
  }

  // -------------------------------------------------------------------
  // q32: corpus × corpus near-neighbor pairs — the symmetric bucketed
  // SELF-join form of the hyperplane LSH: both sides sketched, NO
  // broadcast anywhere. This is the operator a 100 TB dedup-by-embedding
  // pipeline actually runs (d44 is its quadratic oracle baseline, q31
  // its small-query-set sibling). Candidates = ids-only distinct over
  // the (tbl, bucket) equi-join (identical sides → one sketch
  // computation via AQE exchange reuse); embeddings re-attach by
  // equi-join; exact cosine keeps only sim >= threshold, so the output
  // is a SUBSET of d44's exact pairs — recall pinned by
  // DedupSimilaritySpec. More tables × fewer bits than q31
  // (16×5 vs 8×6): pair recall at the 0.4 threshold needs higher
  // per-table collision probability; at larger corpora, scale bits up
  // (bucket occupancy ~ n/2^bits drives the candidate count).
  // -------------------------------------------------------------------
  private val PairTables = 16
  private val PairBits = 5
  private val PairThreshold = 0.4

  def q32CorpusNearDup(spark: SparkSession, dir: String): DataFrame = {
    Vectors.register(spark)
    val e = Tables.embeddings(spark, dir)
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val buckets = bucketed(e, "vec_id", "vec_id",
      col("embedding"), 43, PairTables, PairBits)
    val cand = buckets.as("x").join(buckets.as("y").hint("shuffle_hash"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .withColumn("sim", round(Vectors.vecCosine(col("ea"), col("eb")), 6))
      .filter(col("sim") >= PairThreshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // -------------------------------------------------------------------
  // q33: per-group embedding centroids — the aggregation primitive of
  // embedding pipelines (cluster seeds, per-domain mean vectors).
  // Exploded to (group, dim) so the aggregate is an ordinary partial+
  // final hash agg (one shuffle on (lang, dim), map-side combine); the
  // per-dim sums run in exact decimal over round(x, 7) so partition
  // order cannot perturb the double sum, then ONE double division —
  // bit-identical in DuckDB.
  // -------------------------------------------------------------------
  def q33LangCentroids(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    Tables.embeddings(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
      .select(col("lang"), posexplode(col("embedding")))
      .groupBy(col("lang"), col("pos").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("col").cast(DoubleType), 7).cast(DecimalType(30, 7))).as("s"))
      .select(col("lang"), col("dim"), col("n_vecs"),
        round(col("s").cast(DoubleType) / col("n_vecs"), 6).as("centroid"))
      .orderBy(col("lang"), col("dim"))
  }

  val q33LangCentroidsSql: String =
    s"""WITH joined AS (
       |  SELECT d.lang, e.embedding
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
       |exploded AS (
       |  SELECT lang, j - 1 AS dim, embedding[j] AS x
       |  FROM joined CROSS JOIN range(1, ${Dim + 1}) r(j))
       |SELECT lang, dim, COUNT(*) AS n_vecs,
       |  ROUND(CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE), 7) AS DECIMAL(30,7))) AS DOUBLE)
       |        / COUNT(*), 6) AS centroid
       |FROM exploded
       |GROUP BY lang, dim
       |ORDER BY lang, dim""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql("q30_ann_brute", q30AnnBrute _, q30AnnBruteSql),
    QueryDef.rowsOnly("q31_ann_lsh", q31AnnLsh _),
    QueryDef.rowsOnly("q32_corpus_neardup", q32CorpusNearDup _),
    QueryDef.sql("q33_lang_centroids", q33LangCentroids _, q33LangCentroidsSql),
  )
}
