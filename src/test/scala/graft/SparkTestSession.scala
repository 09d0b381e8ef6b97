package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites reuse it via
  * getOrCreate — Spark allows a single context per JVM).
  *
  * SPARK_GRAFT_MASTER overrides the local[4] default so the SPEC suites
  * can run under the multi-executor topology (r15, VERDICT r14
  * "what's missing" #2 — the streaming kill/restart suite had only ever
  * validated the state store and checkpoint recovery in-process):
  *
  * ```
  * sbt -batch Test/package package
  * SPARK_GRAFT_MASTER=local-cluster[4,8,2048] \
  * SPARK_GRAFT_JARS=target/scala-2.13/streamprocessingspark_2.13-0.1.0.jar,\
  * target/scala-2.13/streamprocessingspark_2.13-0.1.0-tests.jar \
  *   sbt -batch "testOnly graft.RainStormSpec"
  * ```
  *
  * (both jars ship: main classes for the operators, the tests jar for
  * spec-local closures that execute on executors). `core.Topology`
  * carries the spark.jars + executor add-opens plumbing. */
object SparkTestSession {
  def apply(): SparkSession = {
    val s = graft.core.Topology(graft.core.EngineConf(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // match Verify/Bench: open-cost floor below the fixtures' row-
      // group size so split planning can use the row groups
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
