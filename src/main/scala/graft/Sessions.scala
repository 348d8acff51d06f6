package graft

import org.apache.spark.sql.SparkSession

/** Shared master-selection plumbing for the runtime mains and the test
  * session: `SPARK_GRAFT_MASTER` overrides the default `local[n]`, and a
  * `local-cluster[n,c,m]` master — REAL separate executor JVMs with
  * remote shuffle/broadcast fetch over a loopback RPC, no external
  * infrastructure — gets the extra wiring those child processes need.
  *
  * Why this exists: `local[n]` runs every task in the driver JVM, so
  * task closures, the native Catalyst expressions
  * ([[graft.functions.MinHashSig]] et al.), the
  * [[graft.plans.TopKPerGroup]] physical operators, and broadcast
  * variables are NEVER serialized across a process boundary — a
  * serialization defect is invisible locally and fatal on any real
  * cluster. `local-cluster` is the cheapest execution mode that crosses
  * that boundary; the round-13 verification runs the full oracle surface
  * under it.
  */
object Sessions {

  /** Env knob: e.g. `SPARK_GRAFT_MASTER=local-cluster[4,8,4096]`. */
  val MasterEnv = "SPARK_GRAFT_MASTER"

  def master(default: String): String = sys.env.getOrElse(MasterEnv, default)

  /** The JDK-17 module opens Spark needs in EVERY JVM it owns. The
    * driver gets them from build.sbt's `javaOptions`; local-cluster
    * executor JVMs are launched by the Worker and inherit nothing from
    * sbt, so they must carry them via `spark.executor.extraJavaOptions`.
    * Mirrors org.apache.spark.launcher.JavaModuleOptions (what
    * spark-submit injects).
    */
  private val jdk17Opens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** Apply the master (env override or `default`) plus, for
    * `local-cluster`, the executor-process wiring: the driver's full
    * classpath (the Worker launches bare executor JVMs that otherwise
    * see only Spark's own jars — the application classes must ship) and
    * the module opens. `spark.jars`-style shipping would also work but
    * drags a packaging step into every run; the processes share one
    * machine, so the literal classpath is the honest transport.
    */
  def withMaster(b: SparkSession.Builder, default: String): SparkSession.Builder =
    withExactMaster(b, master(default))

  /** [[withMaster]] minus the env override — for harnesses whose claim
    * IS the topology (the executor-kill chaos main must run a real
    * multi-process cluster whatever the suite's master is).
    */
  def withExactMaster(b: SparkSession.Builder, m: String): SparkSession.Builder = {
    val withM = b.master(m)
    if (!m.startsWith("local-cluster")) withM
    else withM
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", jdk17Opens)
      // PIN (not change) standalone's executor-retry bound (VERDICT r13
      // + round-14 self-review): 10 IS Spark 4.1.2's default — setting
      // it documents the dependence and guards upstream default drift,
      // nothing more. What the bound covers, against Master's removal
      // logic (remove only when the consecutive-failure counter hits
      // the bound AND no executor is RUNNING): (a) a genuinely
      // unschedulable app — executors dying at launch, the
      // missing-SPARK_SCALA_VERSION case — is removed within seconds
      // (observed in this round's mislaunched run); (b) a deliberate
      // kill of SOME executors (the chaos tests) never trips a healthy
      // app, survivors are RUNNING; (c) the r13 teardown storm
      // (`failed 299 times`) is NOT bounded by ANY value here — each
      // relaunched executor briefly reaches RUNNING against the
      // stopping driver, resetting the counter. That churn is
      // teardown-cosmetic (the app is already stopping) with no
      // conf-level fix; recorded so nobody "fixes" it by lowering this
      // value, which only hair-triggers (a).
      .config("spark.deploy.maxExecutorRetries", "10")
  }
}
