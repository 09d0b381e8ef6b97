package graft

import org.apache.spark.sql.SparkSession

/** One-off per-stage timing probe for the pp01 capstone's inverted
  * sf0.1-vs-sf1 profile (VERDICT r12 "what's wrong" #1). Prints one
  * line per stage: name, wall seconds, rows in/out. */
object Pp01Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .appName("pp01-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    sys.props("graft.pp01.timing") = "true"
    val t0 = System.nanoTime()
    val (lineage, frames, persisted) = operators.Pipeline.run(s, d, keepFrames = true)
    val persistedByName = persisted.toMap
    val total = (System.nanoTime() - t0) / 1e9
    // cache-effectiveness check: repeated actions on a persisted frame
    // should be near-instant if the cache is actually hit
    for ((name, df) <- frames.takeRight(3)) {
      for (i <- 1 to 3) {
        val a = System.nanoTime()
        df.count()
        println(f"PP01RECOUNT $name%-14s pass$i ${(System.nanoTime() - a) / 1e9}%6.2fs")
      }
      val a = System.nanoTime()
      df.select(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws(":",
            df.columns.map(org.apache.spark.sql.functions.col): _*)))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).head
      println(f"PP01REFP    $name%-14s md5-agg ${(System.nanoTime() - a) / 1e9}%6.2fs")
      val fresh = df.groupBy().count()
      val ep = fresh.queryExecution.executedPlan.toString
      // cache lookup must probe the persisted PRE-cut frame: the cut
      // frame is a LogicalRDD leaf with no InMemoryRelation, so a lookup
      // on it always misses regardless of cache state (r13 advisor)
      val hit = s.sharedState.cacheManager
        .lookupCachedData(
          persistedByName(name)
            .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isDefined
      println(s"PP01CACHE   $name lookupHit=$hit imr=${
        ep.split('\n').count(_.contains("InMemoryTableScan"))} fileScan=${
        ep.split('\n').count(_.contains("FileScan"))} planLines=${
        ep.split('\n').length}")
    }
    lineage.foreach { case (ord, name, in, out, _) =>
      println(f"PP01STAGE $ord%2d $name%-14s in=$in%8d out=$out%8d")
    }
    println(f"PP01TOTAL $total%.1f s  ($d)")
    s.stop()
  }
}
