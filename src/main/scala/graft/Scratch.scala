package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler (not part of the driver contract). */
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
    val shP = spark.read.parquet("/tmp/shingles")
    val expl = shP.select(col("doc_id"), explode(col("sh")).as("s"))
    for (n <- Seq(8, 32, 128)) {
      t(s"$n min-aggs") {
        val mins = (0 until n).map(i =>
          min(xxhash64(lit(i), col("s"))).as(s"m$i"))
        expl.groupBy("doc_id").agg(mins.head, mins.tail: _*)
          .agg(max("m1")).collect()(0).get(0)
      }
    }
    t("nested-transform sig128") {
      shP.select(col("doc_id"),
        expr("transform(sequence(0, 127), i -> " +
          "array_min(transform(sh, x -> xxhash64(CAST(i AS BIGINT), x))))")
          .as("sig"))
        .agg(max(expr("sig[7]"))).collect()(0).get(0)
    }
    t("current dd02 query") {
      SparkEntry.queries("dd02_jaccard_pairs")(spark, d).count()
    }
    t("current dd03 query") {
      SparkEntry.queries("dd03_minhash_lsh")(spark, d).count()
    }
    t("current dd04 query") {
      SparkEntry.queries("dd04_simhash_pairs")(spark, d).count()
    }
    spark.stop()
  }
}
