package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for jobs and tests.
  *
  * Settings chosen for the 100 TB design target (see SURVEY.md §4.2):
  * AQE on (runtime partition coalescing, skew-join splitting, join-strategy
  * switch), UTC session time zone for oracle parity, shuffle partitions
  * sized to the local core count rather than the 200 default — on a real
  * cluster this would be `spark.sql.adaptive.coalescePartitions` doing the
  * sizing from `advisoryPartitionSizeInBytes`.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // InferFiltersFromGenerate clones the generator's input expression
      // into a pre-Generate guard; predicate pushdown then sinks that
      // clone below exchanges, re-running expensive array builders (e.g.
      // shingling) once per guard term in the narrow pre-shuffle stage.
      // Our generators always run post-repartition on compute-dense
      // arrays, so the inferred guard only duplicates work.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    // ERROR, not WARN: the harness mains (Bench/Verify) print ONE
    // machine-parsed line each, and a 262-query run otherwise emits
    // thousands of benign localCheckpoint-unpersist WARNs — r15's driver
    // bench artifact captured only WARN spam and recorded parsed=null
    // (the same artifact-failure class as CORRECTNESS_r15={}). Anything
    // at ERROR still surfaces.
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
