package graft.core

import org.apache.spark.sql.SparkSession

/** Multi-executor topology plumbing for the runnable mains (r14, VERDICT
  * r13 next-#1). Everything the engine measured through r13 ran in ONE
  * JVM (`local[N]`): broadcasts never crossed a wire, every persist hit
  * one block manager, and the eager-slice ContextCleaner dance ran
  * against in-process shuffle files. `SPARK_GRAFT_MASTER=
  * local-cluster[W,C,mem]` runs the same gates with W separate executor
  * JVMs — real serialization on every broadcast, shuffle, and cached
  * block — which is the cheapest honest approximation of a cluster this
  * container can host.
  *
  * Required plumbing when the master is not in-process:
  *  - `SPARK_GRAFT_JARS`: the packaged graft jar (sbt package), shipped
  *    to executors via spark.jars — the classes in closures/custom
  *    expressions/the physical operator live outside the Spark distro.
  *  - executor JVMs need the same JDK-17 --add-opens set the forked
  *    driver gets from build.sbt (Platform/unsafe access in Spark's
  *    serializers); spark-class does NOT inject them for local-cluster
  *    workers' executor launches in every path, so they ride along as
  *    spark.executor.extraJavaOptions unconditionally (harmless under
  *    plain local[N], where no separate executor JVM exists).
  */
object Topology {

  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** Apply SPARK_GRAFT_JARS / executor module options to a builder. */
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val withJars = sys.env.get("SPARK_GRAFT_JARS")
      .fold(b)(j => b.config("spark.jars", j))
    withJars.config("spark.executor.extraJavaOptions",
      "-XX:+IgnoreUnrecognizedVMOptions " + AddOpens)
  }
}
