package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Uses the canonical [[GraftSession]] (AQE, excluded optimizer rules,
  * shuffle partitions from SPARK_GRAFT_CPUS) so correctness runs the SAME
  * engine configuration the bench measures — a plan that only passes
  * without AQE (or vice versa) must not slip through.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    // Builder-side iteration aid: GRAFT_VERIFY_ONLY=q65,q66 dumps (and
    // lists oracle SQL for) just the named queries. The driver never sets
    // it, so the gate always runs the full suite. Names match exactly; a
    // trailing '*' opts into prefix matching ("q6" no longer silently
    // selects q60–q69).
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean =
      only.forall(_.exists { p =>
        if (p.endsWith("*")) name.startsWith(p.dropRight(1)) else name == p
      })
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same between-queries storage hygiene as Bench: a 233-query dump
      // run pins hundreds of checkpointed block sets otherwise
      finally ModelCache.releaseTransient(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    ModelCache.releaseAll(spark)
    spark.stop()
  }
}
