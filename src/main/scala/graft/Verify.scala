package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — dump only those
    // (dev loop for spot-checking one query at a big SF without paying
    // for the whole surface; tools/check.py skips absent dumps)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Set.empty[String])
      case Array(s, o, f) => (s, o, f.split(',').toSet)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — the
    // multi-executor validation runs this same gate under
    // local-cluster[W,C,mem] (r14, VERDICT r13 next-#1): separate
    // executor JVMs, real serialization on every broadcast/shuffle.
    // SPARK_GRAFT_JARS must then carry the packaged graft jar (executors
    // outside the driver JVM need the classes shipped).
    val spark = graft.core.Topology(graft.core.EngineConf(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // single-file tables (driver layout) at sf>=1.0 are ~100 MB — under
      // the 128 MB default every scan is ONE partition and starves the
      // whole plan; 16 MB keeps local[N] scans at cluster parallelism
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // the 4 MB default open-cost floors split size at 4 MB, which caps
      // a 20 MB table at ~5 splits no matter its row-group layout; the
      // fixtures are one file per table (no small-file amplification to
      // guard against), so a 512 KB floor — below ScaleData's 2 MB row
      // groups — lets mid-size tables scan at full width natively
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce collapses the whole
      // upstream plan into the single write task (measured at sf1.0:
      // dd05's parallel cartesian became one thread for the entire
      // O(N^2) pass); repartition keeps the query at full parallelism
      // and funnels only the finished result through the one-file write.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // queries may persist indexes internally
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
