ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "exosqlspark"
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
// Pass the forked process's stdout through verbatim (no "[info] " prefix):
// the driver parses Bench's single JSON stdout line, and sbt's default
// LoggedOutput strategy prefixes every line, breaking that parse
// (BENCH_r01/r02 "parsed": null).
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] means the ONE forked JVM is driver + the whole 32-core
  // executor fleet; 8 g gave 0.25 g/core (any production executor is
  // sized 2–8 g/core — guide §5) and a ~4.6 GiB block store whose
  // churn under a 486-key sweep triggered multi-second full-GC /
  // class-unloading stalls landing on random keys (measured: the same
  // key 3–15× slower in-sweep than isolated, different keys each
  // sweep). 24 g on the 128 GiB sandbox sizes the fleet like a small
  // production executor set; SPARK_DRIVER_MEM still overrides. The
  // default degrades gracefully on smaller hosts (VERDICT r14 #8):
  // min(24 g, ~1/4 of physical RAM, floor 2 g), so an env-free
  // `sbt "runMain graft.Bench"` still starts on an 8-core/32 GiB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val physGb =
      try {
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        os.asInstanceOf[com.sun.management.OperatingSystemMXBean]
          .getTotalMemorySize / (1L << 30)
      } catch { case _: Throwable => 128L } // unknown -> assume the sandbox
    s"${math.max(2L, math.min(24L, physGb / 4))}g"
  })}",
  // A full bench sweep whole-stage-codegens 400+ queries × 3 runs in
  // ONE forked JVM; the JDK default 240 MB reserved code cache can
  // fill under that churn, silently disabling the JIT — which craters
  // the driver-side analysis path (spark.sql keys) while DataFrame
  // twins stay flat (BASELINE.md round-12 façade adjudication).
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // opt-in GC diagnostics for bench-noise adjudication (unset = off):
  // SPARK_GC_LOG=<path> writes one line per pause so multi-second
  // in-sweep spikes can be attributed to (or cleared of) GC
  sys.env.get("SPARK_GC_LOG").map(p => s"-Xlog:gc*:file=$p:time,uptime").toSeq
