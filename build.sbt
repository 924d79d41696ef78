ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cuvsspark"
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
// The bench/verify driver tail-parses the LAST stdout line as JSON. Two sbt
// defaults break that: the logger prefixes forked-process output with
// "[info] ", and "[success] Total time: ..." prints after the program exits.
// StdoutOutput passes the forked JVM's stdout through verbatim;
// showSuccess := false drops the trailing success banner.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — silence the
// unused-key lint so the banner stays clean.
Global / excludeLintKeys += showSuccess
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
// local[32] runs driver + all executor threads in this one JVM; the full
// bench/verify session persists many intermediate tables, so an undersized
// heap turns into cache eviction + GC churn. Default: 40% of host RAM
// clamped to [8g, 48g] (48g on the 128 GiB bench host), so smaller
// machines still start; override with SPARK_DRIVER_MEM=<size>.
val defaultHeap: String = {
  val memGb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong / 1024 / 1024 }
      .getOrElse(0L)
    catch { case _: Throwable => 0L }
  s"${math.max(8L, math.min(48L, memGb * 2 / 5))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // one long session JIT-compiles a distinct whole-stage-codegen class per
  // query shape; the 240m default code cache fills mid-run and HotSpot
  // silently stops compiling, leaving later stages interpreted (~20x on
  // tight loops). 512m holds the full bench/verify surface comfortably.
  "-XX:ReservedCodeCacheSize=512m",
)
