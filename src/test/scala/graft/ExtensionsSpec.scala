package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the `spark.sql.extensions=graft.GraftExtensions` injection
  * path end-to-end: a session built with ONLY the conf — no
  * `Vectors.register` call — must resolve the native functions from SQL.
  * Function registries are session-scoped, so a fresh SparkSession (same
  * shared SparkContext) proves resolution came from the injected
  * extension, not from a registration some earlier suite performed.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("vec_* functions resolve from SQL via spark.sql.extensions injection") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 2)
      .getOrCreate()
    try {
      assert(s.sql("SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
        .collect()(0).getDouble(0) == 11.0)
      assert(s.sql("SELECT vec_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c")
        .collect()(0).getDouble(0) == 1.0)
    } finally {
      // do NOT stop `s` — the SparkContext is shared with other suites;
      // just restore whichever session was current before
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
