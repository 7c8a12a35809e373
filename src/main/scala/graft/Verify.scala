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
    val failed = Seq.newBuilder[String]
    var dumped = 0
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        dumped += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
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
    // Self-verifying artifact (VERDICT r15 item 1: the driver recorded
    // {} for a round whose suite passed 261/261). After the dump, read
    // the artifacts BACK from disk and publish a machine-checkable
    // summary — SELFCHECK.json + one stdout line — so an empty or
    // partial dump can never pass silently: tools/closing_gate.sh greps
    // this line and fails the round if dumped==0, oracle_entries==0, or
    // any query failed.
    val oracleBytes = Files.readAllBytes(Paths.get(s"$outDir/oracle_sql.json"))
    val oracleSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(oracleBytes).map(b => f"$b%02x").mkString
    val oracleEntries = SparkEntry.oracleSql.count(kv => selected(kv._1))
    val failedNames = failed.result()
    val dumpDirs = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty).count(f => f.isDirectory &&
        Option(f.listFiles()).exists(_.exists(_.getName.endsWith(".parquet"))))
    val selfcheck =
      s"""{"dumped": $dumped, "dump_dirs_with_parquet": $dumpDirs, """ +
      s""""failed": ${failedNames.map(q).mkString("[", ",", "]")}, """ +
      s""""oracle_entries": $oracleEntries, """ +
      s""""oracle_bytes": ${oracleBytes.length}, """ +
      s""""oracle_sha256": ${q(oracleSha)}}"""
    Files.writeString(Paths.get(s"$outDir/SELFCHECK.json"), selfcheck)
    println(s"[verify] SELFCHECK dumped=$dumped dirs=$dumpDirs " +
      s"failed=${failedNames.size} oracle_entries=$oracleEntries " +
      s"oracle_bytes=${oracleBytes.length} sha256=${oracleSha.take(16)}")
    ModelCache.releaseAll(spark)
    spark.stop()
  }
}
