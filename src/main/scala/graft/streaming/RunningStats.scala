package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** The engine's core operator: cumulative per-key descriptive statistics —
  * the Structured-Streaming-native rebuild of the reference's
  * `updateStateByKey` state machine
  * (KafkaStreamAverageCalculator.java:102-171, see SURVEY.md §2.4).
  *
  * Declarative form: `groupBy(key).agg(sum/count/min/max/avg/var_samp)`.
  * Spark's `var_samp` is `CentralMomentAgg` — the same Welford mean/m2
  * recurrence the reference hand-codes (its comment cites the same
  * Wikipedia algorithm) — so the state the state-store carries is exactly
  * the reference's `Double[8]` vector, minus the quirks:
  *
  *  - Q1 (sentinel min=-10/max=-150 initializers): correct min/max here;
  *    the byte-faithful variant lives in [[graft.fidelity.WelfordAggregator]].
  *  - Q2 (`currentReadTagID` race): the group key is used, which is the
  *    reference author's acknowledged intent (`AVG:163` TODO).
  *  - Q3 (`delta` loop-leak): emitted as 0.0 to keep the 10-field wire
  *    schema; the imperative fidelity aggregator reproduces the real leak.
  *  - Q6 (count accumulated in floating point): `count` is a proper Long.
  *
  * Because the aggregation is declarative, the identical column set runs as
  * a batch query (oracle gate) and as an Update-mode streaming query
  * (per-epoch partial agg merged into the state store by
  * IncrementalExecution) — Spark's batch/stream unification carries the
  * semantics. At 100 TB the only shuffle is the one on the group key, with
  * map-side partial aggregation; state is O(distinct keys), not O(rows).
  */
object RunningStats {

  /** The 8-slot statistics vector, named per the reference's output POJO
    * (SparkStreamingStatisticsProcessingResult.java:5-14).
    */
  def statsColumns(value: Column): Seq[Column] = Seq(
    sum(value).as("summer"),
    count(value).as("counter"),
    sum(value * value).as("sumsqr"),
    min(value).as("bestmin"),
    max(value).as("bestmax"),
    avg(value).as("mean"),
    coalesce(var_samp(value) * (count(value) - lit(1)), lit(0.0)).as("m2"),
    coalesce(var_samp(value), lit(0.0)).as("var"))

  /** Batch or streaming: cumulative stats per key. */
  def apply(df: DataFrame, key: Column, value: Column): DataFrame = {
    val cols = statsColumns(value)
    df.groupBy(key.as("readTag_id")).agg(cols.head, cols.tail: _*)
  }

  /** Kafka-wire projection: key = tag id, value = JSON with the exact
    * field set/order of the reference's Jackson-serialized POJO
    * (readTag_id, summer, counter, sumsqr, delta, bestmin, bestmax, mean,
    * m2, var — `MODEL:5-14`). `delta` is the Q3 placeholder.
    */
  def toWire(stats: DataFrame): DataFrame =
    stats.select(
      col("readTag_id").as("key"),
      to_json(struct(
        col("readTag_id"), col("summer"), col("counter"), col("sumsqr"),
        lit(0.0).as("delta"), col("bestmin"), col("bestmax"), col("mean"),
        col("m2"), col("var"))).as("value"))

  /** Kafka sink for the stats stream — Update mode: one message per
    * updated key per trigger, the reference's observable cadence
    * (2 s micro-batches, `AVG:65`) without its executor-side producer
    * anti-pattern (SURVEY.md §2.4.2).
    */
  def kafkaWriter(stats: DataFrame, bootstrapServers: String, topic: String,
                  checkpoint: String,
                  idempotent: Boolean = true): DataStreamWriter[Row] =
    kafkaWireWriter(toWire(stats), bootstrapServers, topic, checkpoint, idempotent)

  /** Producer delivery profile (SURVEY §2.4.2 / §3.3). The reference ships
    * `acks=all, retries=0` (`PROD:34-35`) — at-least-once *per send
    * attempt*, droppable on any transient broker error. The engine default
    * enables the idempotent producer instead: `enable.idempotence=true`
    * implies `acks=all`, `retries=MAX_INT`, and in-flight sequencing, so a
    * send survives transient errors with no duplicate and no reorder
    * within a partition. Combined with the Update-mode keyed output
    * (latest stats per key), a recovery replay of an uncommitted epoch
    * re-sends the SAME (key, value) payloads — downstream keyed readers
    * converge, the same discipline FileSinkReplaySpec machine-checks on
    * the parquet sink. `idempotent = false` reproduces the reference's
    * lossy profile for a byte-faithful comparison.
    */
  def producerOptions(idempotent: Boolean = true): Map[String, String] =
    if (idempotent) Map(
      "kafka.enable.idempotence" -> "true",
      "kafka.acks" -> "all")
    else Map(
      "kafka.enable.idempotence" -> "false",
      "kafka.acks" -> "all",
      "kafka.retries" -> "0")

  /** As [[kafkaWriter]] but over an already-wire-shaped (key, value)
    * frame — shared by the declarative and fidelity paths.
    */
  def kafkaWireWriter(wire: DataFrame, bootstrapServers: String, topic: String,
                      checkpoint: String,
                      idempotent: Boolean = true): DataStreamWriter[Row] =
    wire.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .options(producerOptions(idempotent))
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime("2 seconds"))
}
