package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Job-2 semantics (KafkaStreamPropertyAggregator.java): tokenize on the
  * compiled `" "` pattern (`AGG:28,74-79`) and count occurrences
  * (`AGG:81-94`).
  *
  * The reference's counts are **per 2 s micro-batch, not cumulative**
  * (`reduceByKey` on a plain DStream — state resets every batch,
  * SURVEY.md §2.4 A1). Structured Streaming expresses exactly that as a
  * per-batch aggregate inside `foreachBatch`; the cumulative variant is
  * the same aggregate as a Complete/Update-mode streaming query.
  *
  * `explode(split(...))` is a built-in Generator — whole-stage codegen,
  * no UDTF; the count is a partial+final hash aggregate, one shuffle.
  */
object WordCount {

  /** F1: one row per whitespace-separated token. */
  def tokenize(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("word"))
      .filter(col("word") =!= "")

  /** A1: token frequencies of `text` within the given frame (a micro-batch
    * in streaming use, the whole table in batch use).
    */
  def apply(df: DataFrame, text: Column): DataFrame =
    tokenize(df, text).groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Cumulative variant (SURVEY.md §2.4 A1): the same aggregate as a
    * streaming query — Update/Complete output mode makes Spark carry the
    * counts in the state store across micro-batches, the semantics the
    * reference WOULD have had with `updateStateByKey` instead of a plain
    * `reduceByKey`. State is O(distinct words); pair with a watermarked
    * windowed variant when the vocabulary is unbounded.
    */
  def cumulative(stream: DataFrame, text: Column): DataFrame =
    apply(stream, text)

  /** Streaming top-k word rank (SURVEY §2.7 Sorts row: the streaming
    * top-k surface). Sorting an unbounded stream is only meaningful over
    * the complete cumulative aggregate, so this targets COMPLETE output
    * mode — the one mode where Structured Streaming permits a global
    * `orderBy`+`limit` over a streaming aggregate (each epoch re-emits
    * the full current top-k; ties broken by word for a deterministic
    * cut). State is the O(distinct words) count map; the sort itself
    * touches only the aggregate's output rows, not the input stream, so
    * at scale the epoch cost is the aggregate update + a top-k
    * TakeOrderedAndProject over |vocabulary| rows. For unbounded
    * vocabularies pair with a watermarked window or the state-TTL
    * recipe; for Update-mode sinks run the same rank in `foreachBatch`
    * against an external keeper table.
    */
  def topK(stream: DataFrame, text: Column, k: Int): DataFrame =
    cumulative(stream, text)
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)
}
