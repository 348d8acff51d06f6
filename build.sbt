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
  // retries give up before GC can run (JDK-8192647 shape). The retry
  // bound (the direct fix for that JDK-bug shape) stays global; it is
  // inert outside a GCLocker pileup.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
  // The soak round ALSO set -XX:G1HeapRegionSize=32m globally so the
  // 8.4 MB buffers stop being humongous — but the round-17 optimization
  // profile caught that flag thrashing every 32-way allocation-heavy
  // SQL stage at the default 8 GiB heap (measured: x2_jaccard_neardup
  // 40.3 s -> 4.0 s, stage GC wall 119 s -> 2 s, by removing the flag
  // alone; 256 coarse regions starve G1's young sizing under 32
  // concurrent allocating tasks). Region size is workload-dependent,
  // not a blanket constant: the soak recipe opts back in via
  // SPARK_GRAFT_G1_REGION=32m (STRESS_r17 / scripts), everything else
  // runs the JVM's heap-derived default (4 MB at 8 GiB).
) ++ sys.env.get("SPARK_GRAFT_G1_REGION")
  .map(r => s"-XX:G1HeapRegionSize=$r").toSeq ++
  // experiment escape hatch for forked runs (e.g. A/B of a spark.graft.*
  // conf without a code edit); unset in every recorded configuration
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
