package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Probe main run in a FRESH JVM by [[ExtensionsSpec]]: builds the very
  * first SparkSession of its process with only
  * `spark.sql.extensions=graft.GraftExtensions` (no `Vectors.register`
  * call) and resolves the native functions from SQL. Exits 0 and prints
  * EXTENSIONS_OK on success.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-probe")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    val d = s.sql("SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .collect()(0).getDouble(0)
    val c = s.sql("SELECT vec_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c")
      .collect()(0).getDouble(0)
    s.stop()
    if (d == 11.0 && c == 1.0) println("EXTENSIONS_OK")
    else { println(s"EXTENSIONS_BAD d=$d c=$c"); sys.exit(1) }
  }
}

/** Exercises the `spark.sql.extensions` injection path end-to-end.
  *
  * This MUST run in a fresh JVM: Spark reads the extensions conf from
  * the SparkContext's conf at session build, so passing it as a builder
  * option on a pre-existing context (the shared test JVM always has one
  * once any other suite ran) is silently ignored — an in-process version
  * of this test is order-dependent, passing only when it happens to run
  * first. The probe JVM builds its context FROM the conf, which is the
  * deployment shape (`--conf spark.sql.extensions=...`) this test exists
  * to pin.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("vec_* functions resolve from SQL via spark.sql.extensions in a fresh JVM") {
    import scala.sys.process._
    val javaBin = s"${sys.props("java.home")}/bin/java"
    // mirrors build.sbt's jdk17AddOpens (the forked JVM's RuntimeMXBean
    // does not expose its input arguments here, so the list cannot be
    // harvested at runtime; keep the two in sync)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.sql.session.timeZone=UTC", "-Xmx2g",
      "-cp", sys.props("java.class.path"), "graft.ExtensionsProbe")
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => { out.append(l).append('\n'); () }))
    assert(code == 0 && out.toString.contains("EXTENSIONS_OK"),
      s"probe JVM failed (exit $code):\n${out.toString.takeRight(3000)}")
  }
}
