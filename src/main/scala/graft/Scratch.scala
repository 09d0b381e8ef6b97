package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q05_broadcast_join", "q15_star_join",
        "q03_topk_orders", "sim01_knn_bruteforce", "q01_pricing_summary")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
