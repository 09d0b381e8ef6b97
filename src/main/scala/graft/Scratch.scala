package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor / profiler (not part of the driver contract).
  *
  * Usage: `sbt "runMain graft.Scratch [queryName...]"` — prints the
  * formatted physical plan and wall time of each named query (default: a
  * representative set) at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // see Verify: keeps single-file table scans parallel at sf>=1.0
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q05_broadcast_join", "q15_star_join",
        "dd02_jaccard_pairs", "dd03_minhash_lsh", "sim01_knn_bruteforce")
    // SCRATCH_WARMUP=1 replicates Bench's all-queries smallest-sf warmup
    // pass; SCRATCH_SINK=noop replicates its noop-write materialization — so
    // a Scratch number is comparable to the BENCH number for the same query.
    // The warmup sf is derived from the measured dir (its sf0.001 sibling,
    // falling back to the dir itself) so pointing SPARK_GRAFT_SF_DIR at a
    // different dataset root keeps warmup and measurement on the same data.
    if (sys.env.get("SCRATCH_WARMUP").contains("1")) {
      val sib = new java.io.File(new java.io.File(d).getParentFile, "sf0.001")
      val warmDir = if (sib.isDirectory) sib.getPath else d
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        finally spark.catalog.clearCache()
      }
      println("========== warmup done ==========")
    }
    val useNoop = sys.env.get("SCRATCH_SINK").contains("noop")
    val showPlan = sys.env.get("SCRATCH_PLAN").contains("1")
    names.foreach { n =>
      println(s"========== $n ==========")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, d)
      if (showPlan) println(df.queryExecution.executedPlan.toString)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val rows = if (useNoop) {
        df.write.format("noop").mode("overwrite").save(); -1L
      } else df.count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      println(f"--> $rows rows; build $tBuild%.2f s, total $tTotal%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
