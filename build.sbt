ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pipelineairflowdockerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites MUST run sequentially (ADVICE r15 #3): several suites scope
// JVM-global sys.props overrides (fence restart/stale leases shrunk to
// 300-3000ms) via SparkSpec.withProps — a concurrently running suite
// seeing a shrunk lease could wrongfully reclaim a live fence. Both
// knobs pinned: parallelExecution governs in-process/grouped runs,
// testForkedParallel governs concurrency inside the one forked JVM.
Test / parallelExecution := false
Test / testForkedParallel := false
run / fork := true
// pass the forked run's stdout through RAW: sbt's default LoggedOutput
// prefixes every line with `[info] `, which broke the driver's parse of
// Bench's final JSON line four rounds running (VERDICT r13 #4)
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The x200 admission soak (STRESS_r17) died at batch ~140 with
  // spurious OOMs and ZERO full GCs in the log: 32 snappy-decompressing
  // tasks hold JNI critical sections (GCLocker) while peers allocate
  // ~8.4 MB parquet column buffers — humongous in G1's default 4 MB
  // regions at 8 GiB heap — and the default 2 GCLocker allocation
  // retries give up before GC can run (JDK-8192647 shape). Both
  // constants re-derived from that measurement: 32 MB regions make the
  // 8.4 MB buffers regular allocations (humongous = region/2), and 64
  // retries outlast any critical-section pileup. Standard knobs on
  // production Spark-on-JDK17 executors — set them cluster-side too.
  "-XX:G1HeapRegionSize=32m",
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
