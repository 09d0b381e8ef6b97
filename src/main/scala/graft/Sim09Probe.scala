package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Scale

/** Dev-only decomposition probe for sim09's cost structure (join+rescore
  * vs heap selection) — drives the same kernels stage-by-stage so the
  * superlinear term at a given sf is attributable. Not part of the
  * driver contract; see PLANS.md round-11 sim09 notes. */
object Sim09Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_gen/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graftx.functions.{dot_product, l2_norm}
    import org.apache.spark.sql.graftx.SignBucketsFunctions.sign_buckets

    val L = 8
    val e = Tables.wide(spark, d, "embeddings", "vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        l2_norm(col("embedding")).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val B = Scale.lshPlanes(e.count())
    val own = e.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(sign_buckets(col("embedding"), B, L))
        .as(Seq("tbl", "bucket")))
    val probe = own.select(col("vec_id"), col("embedding"), col("nrm"),
      col("tbl"),
      explode(array(col("bucket") +: (0 until B).map(b =>
        col("bucket").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    val raw = dot_product(col("x.embedding"), col("y.embedding")) /
      (col("x.nrm") * col("y.nrm"))
    val joined = probe.as("x").join(own.hint("merge").as("y"),
        col("x.tbl") === col("y.tbl") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("u"), col("y.vec_id").as("v"),
        raw.as("c"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // stage A: join + rescore only (global sum forces the cosine, no heap)
    val a = time("join+rescore (sum agg)") {
      joined.agg(count(lit(1)), sum(col("c"))).collect()(0)
    }
    println(s"PROBE candidate rows: ${a.getLong(0)}")
    // stage B: join + rescore + explode + dedup-heap selection (full query)
    time("full sim09 (heap selection)") {
      val edges = joined
        .select(explode(array(
          struct(col("u").as("src"), col("v").as("dst"), col("c")),
          struct(col("v").as("src"), col("u").as("dst"), col("c"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.c").as("c"))
      Scale.topKPerGroupDistinct(edges, Seq("src"), 13, Seq("dst"),
        col("c").desc, col("dst").asc)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
