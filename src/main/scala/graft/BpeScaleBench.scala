package graft

import org.apache.spark.sql.SparkSession

/** Production-scale BPE evidence: trains `merges` (default 1000) rules on
  * the open-vocab fixture with per-`batch` (default 100) re-materialization
  * of the encoded vocab relation (Bpe.trainN) and reports the mean step
  * wall per 100-merge block. The claim under test: per-step cost is
  * VOCAB-bounded — block means stay flat as the merge index grows,
  * because each step is one scan of the persisted vocab relation + one
  * vocab-sized pair aggregate regardless of how many merges precede it,
  * and the rebase keeps the folded replace chain <= batch so the
  * projection never grows without bound either.
  *
  * Usage: SPARK_GRAFT_SF_DIR=testdata_gen/open/sf1 \
  *   sbt "runMain graft.BpeScaleBench [merges] [batch]"
  * Emits one JSON line (block means, totals, learned-merge count).
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata_gen/open/sf1")
    val merges = args.headOption.map(_.toInt).getOrElse(1000)
    val batch = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val steps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    val learned = graft.operators.Bpe.trainN(spark, d, merges, batch,
      onStep = (_, s) => steps += s)
    val total = (System.nanoTime() - t0) / 1e9
    val blocks = steps.grouped(100).map(b => b.sum / b.length).toSeq
    val blockJson = blocks.map(b => f"$b%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"bpe_scale","sf":"$d","merges":${learned.length},"batch":$batch,"total_s":$total%.1f,"block_mean_step_s":$blockJson,"last_over_first":${
      if (blocks.size > 1) f"${blocks.last / blocks.head}%.2f" else "1.0"}}""")
    spark.stop()
  }
}
