package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, Test/fork := true). */
object TestSession {
  lazy val spark: SparkSession = {
    // SPARK_GRAFT_MASTER lets the plan-pin suites run under
    // local-cluster[n,c,m] — the cross-JVM serialization check
    val s = Sessions.withMaster(SparkSession.builder(), "local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(e => new graft.functions.GraftExtensions()(e))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Run `body` with session confs set, restoring (set-back or unset)
    * on every exit — the shared session must never leak one suite's
    * conf into the next. Hoisted here from seven identical per-suite
    * copies (round-14 self-review).
    */
  protected def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Set JVM props for the body, restoring on every exit — the fence
    * leases ([[graft.operators.StoreDirs.staleFenceMs]] etc.) read
    * sys.props at call time, so tests can shrink them.
    */
  protected def withProps[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> sys.props.get(k) }
    pairs.foreach { case (k, v) => sys.props(k) = v }
    try body
    finally old.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None)    => sys.props.remove(k)
    }
  }
}
