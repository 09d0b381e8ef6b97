package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler / plan auditor (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val docs = core.Tables(spark, d, "documents")
    val fp = docs.select(col("doc_id"),
      explode(org.apache.spark.sql.graftx.GraftFunctions
        .winnow_fingerprint(col("text"))).as("f"))
    t("winnow explode count")(fp.count())
    t("winnow distinct count")(fp.distinct().count())
    t("tx05 full")(SparkEntry.queries("tx05_winnow_pairs")(spark, d).count())
    t("tx05 again")(SparkEntry.queries("tx05_winnow_pairs")(spark, d).count())
    spark.stop()
  }
}
