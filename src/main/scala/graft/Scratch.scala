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
    val sh = core.Tables(spark, d, "documents")
      .select(col("doc_id"),
        org.apache.spark.sql.graftx.WordShinglesFunctions
          .word_shingles(col("text"), 3).as("sh"))
    t("native shingles full scan")(sh.agg(sum(size(col("sh")))).collect()(0))
    t("warm dd02")(SparkEntry.queries("dd02_jaccard_pairs")(spark, d).count())
    spark.catalog.clearCache()
    t("dd02 run2")(SparkEntry.queries("dd02_jaccard_pairs")(spark, d).count())
    spark.catalog.clearCache()
    t("dd03 run1")(SparkEntry.queries("dd03_minhash_lsh")(spark, d).count())
    spark.catalog.clearCache()
    t("dd03 run2")(SparkEntry.queries("dd03_minhash_lsh")(spark, d).count())
    spark.catalog.clearCache()
    spark.stop()
  }
}
