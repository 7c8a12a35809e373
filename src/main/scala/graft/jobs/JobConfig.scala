package graft.jobs

/** Tiny CLI config shared by the two job mains — the Spark-native stand-in
  * for the reference's positional-args parsing (which has an off-by-one:
  * `args.length < 4` guarded but `args[4]` read,
  * KafkaStreamAverageCalculator.java:39-52 — SURVEY.md Q5; not ported).
  *
  * Flags:
  *   --source kafka://host:port/topic | file:/sfDir   (default: the
  *       reference's endpoints, kafka://localhost:9092/bms)
  *   --sink   kafka://host:port/topic | console       (default console)
  *   --checkpoint <dir>   (default: ./spark_cache, the reference's dir,
  *       AVG:70)
  *   --trigger <interval> (default "2 seconds", the reference's 2000 ms
  *       batch clock, AVG:65/AGG:58)
  *   --once               (file replay: process everything available,
  *       then exit — the sandbox/test mode; without it the job runs until
  *       terminated, like the reference)
  *   --fidelity           (AverageCalculatorJob only: the imperative
  *       transformWithState state machine instead of the declarative
  *       aggregate — byte-faithful per-record replay of AVG:102-171
  *       including the delta loop-leak and the Double counter;
  *       configures the RocksDB state store it requires)
  *   --min-partitions <n> (kafka source only: minimum read-split
  *       parallelism across the subscription — the DSv2 stand-in for the
  *       reference's per-topic receiver thread counts, the topicMap
  *       values at AVG:41-45; 0 = source default)
  *
  * Multi-topic parity (`AVG:41-45`): the source topic segment may be a
  * comma list — `kafka://host:9092/bms,bms2` subscribes both, mirroring
  * the reference's `Map<topic, threads>` subscription.
  */
final case class JobConfig(
    source: String = "kafka://localhost:9092/bms",
    sink: String = "console",
    checkpoint: String = "./spark_cache",
    trigger: String = "2 seconds",
    once: Boolean = false,
    fidelity: Boolean = false,
    minPartitions: Int = 0) {

  def isFileSource: Boolean = source.startsWith("file:")
  def sourcePath: String = source.stripPrefix("file:")

  /** kafka://host:port/topic[,topic2,...] → (host:port, topic list).
    * The topic segment is normalized (trimmed, empties dropped,
    * rejoined) before it becomes the DSv2 `subscribe` value — a
    * malformed list like `bms,,x` or ` ,bms` would otherwise pass
    * verbatim and only fail at stream start (ADVICE r16); a sink URI
    * must name exactly ONE topic — [[kafkaSinkParts]] enforces that.
    */
  def kafkaParts(uri: String): (String, String) = {
    val rest = uri.stripPrefix("kafka://")
    val slash = rest.lastIndexOf('/')
    require(slash > 0, s"expected kafka://host:port/topic, got $uri")
    val topics = rest.substring(slash + 1)
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(topics.nonEmpty, s"expected at least one topic in $uri")
    (rest.substring(0, slash), topics.mkString(","))
  }

  /** Sink variant: one topic only — records are produced to a single
    * topic (`PROD:52-54`), never fanned out. Validated on the RAW topic
    * segment, before [[kafkaParts]] normalization: a sink URI like
    * `kafka://h:9092/out,,` must fail the one-topic check rather than be
    * silently accepted after empty tokens are dropped (ADVICE r17 — the
    * r16 normalization had quietly loosened this).
    */
  def kafkaSinkParts(uri: String): (String, String) = {
    val rest = uri.stripPrefix("kafka://")
    val raw = rest.substring(rest.lastIndexOf('/') + 1)
    require(raw.trim.nonEmpty && !raw.contains(","),
      s"kafka sink must name exactly one topic, got '$raw'")
    kafkaParts(uri)
  }
}

object JobConfig {
  def parse(args: Array[String]): JobConfig = {
    @annotation.tailrec
    def loop(rest: List[String], c: JobConfig): JobConfig = rest match {
      case "--source" :: v :: t     => loop(t, c.copy(source = v))
      case "--sink" :: v :: t       => loop(t, c.copy(sink = v))
      case "--checkpoint" :: v :: t => loop(t, c.copy(checkpoint = v))
      case "--trigger" :: v :: t    => loop(t, c.copy(trigger = v))
      case "--once" :: t            => loop(t, c.copy(once = true))
      case "--fidelity" :: t        => loop(t, c.copy(fidelity = true))
      case "--min-partitions" :: v :: t =>
        loop(t, c.copy(minPartitions = v.toInt))
      case Nil                      => c
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown flag: $other")
    }
    loop(args.toList, JobConfig())
  }
}
