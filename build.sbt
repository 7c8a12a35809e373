ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spark_streaming_stream_analyzerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 executor threads sharing one JVM: 8g forces full-GC churn on the
  // shuffle-heavy dedup/window queries (the machine has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++
  // experiment passthrough into the forked run JVM (e.g.
  // GRAFT_JAVA_OPTS="-Dspark.graft.checkpointDir=/tmp/ckpt" for the
  // reliable-mode bench rows) — env is read at sbt load, so export it
  // before invoking sbt. Split on single spaces: an option VALUE must not
  // contain spaces (-Dfoo="a b" would break into two bogus options); no
  // current graft conf needs one (ADVICE r17 — documented limitation)
  sys.env.get("GRAFT_JAVA_OPTS").map(_.split(" ").toSeq.filter(_.nonEmpty))
    .getOrElse(Seq.empty)
