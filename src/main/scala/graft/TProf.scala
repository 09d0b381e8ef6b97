package graft

import org.apache.spark.sql.SparkSession

// temp dev profiler (not committed)
object TProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = SparkEntry.queries("dd05_embedding_neardup")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val lsh = SparkEntry.queries("dd07_embedding_neardup_lsh")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val subset = lsh.subsetOf(exact)
      println(f"[tprof] $sf exact=${exact.size} lsh=${lsh.size} subset=$subset recall=${if (exact.nonEmpty) lsh.size.toDouble / exact.size else 1.0}%.3f time=$dt%.2f s")
      // mm04 sanity
      val mm = SparkEntry.queries("mm04_media_embed_knn")(spark, sf).collect()
      println(s"[tprof] $sf mm04 rows=${mm.length} distinct=${mm.map(_.getLong(0)).distinct.length} nanSim=${mm.count(r => r.getDouble(3).isNaN)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
