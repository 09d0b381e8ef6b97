package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Scale, Similarity, Whitening}

/** Whitening adoption evidence (VERDICT r11 #5): runs the PRODUCT
  * queries (dd07's pair kernel, sim09's kNN graph) on two open
  * fixtures — the isotropic embeddings every round measures, and the
  * anisotropic-spectrum variant (`ScaleData ... aniso`) — under
  * `graft.lsh.whiten` off/on, and reports per arm:
  *
  *   - the measured spectrum skew (lambda_1 / mean eigenvalue) and
  *     what `auto` mode would decide,
  *   - candidate volume (collision-join rows) at the SAME B/L — the
  *     equal-cost axis,
  *   - dd07 recall vs the exact sampled pair set,
  *   - sim09 recall vs a 32-source exact probe + wall seconds.
  *
  * Writes BENCH_whiten.json. The adoption rule this evidences: whiten
  * iff skew >= 4 (auto) — expected to REJECT on the isotropic fixture
  * (the r11 A/B showed no gain there) and ADOPT on the aniso one.
  */
object WhitenBench {

  private def jnum(v: Double): String = f"$v%.4f"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graftx.SignBucketsFunctions.sign_buckets

    val fixtures = Seq(
      "iso" -> sys.env.getOrElse("WHITEN_ISO_DIR",
        "/root/repo/testdata_gen/emb_sf1"),
      "aniso" -> sys.env.getOrElse("WHITEN_ANISO_DIR",
        "/root/repo/testdata_gen/emb_aniso_sf1"))

    val parts = fixtures.map { case (fname, dir) =>
      val e0 = Tables.wide(spark, dir, "embeddings", "vec_id", "embedding")
        .select(col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = e0.count()
      val b = Scale.lshPlanes(n)
      val sp = Whitening.ensure(spark, dir, e0)
      val autoDecision =
        if (sp.skew >= Whitening.SkewThreshold) "adopt" else "reject"
      // exact sampled pair set once per fixture (mode-independent),
      // with the cosine kept for BAND-split recall: the marginal band
      // (0.45 <= cos < 0.7, random-geometry pairs) and the high band
      // (cos >= 0.85, true near-dups — planted on the aniso fixture)
      // answer DIFFERENT adoption questions
      val exactPairs = Dedup.sampledExactPairs(spark, dir)
        .select(col("v1"), col("v2"), col("cos_r"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nExact = exactPairs.count()
      val nMarginal = exactPairs
        .filter(col("cos_r") >= 0.45 && col("cos_r") < 0.7).count()
      val nHigh = exactPairs.filter(col("cos_r") >= 0.85).count()
      // exact top-5 for 32 probe sources (sim09's audit reference)
      val qs = e0.filter(col("vec_id") < 32)
        .select(col("vec_id").as("src"), col("embedding").as("qv"))
      import graft.functions.VectorFunctions.cosine
      val exactKnn = Scale.topKPerGroup(
          e0.crossJoin(broadcast(qs))
            .filter(col("vec_id") =!= col("src"))
            .select(col("src"), col("vec_id").as("dst"),
              round(cosine(col("qv"), col("embedding")), 6).as("c")),
          Seq("src"), Similarity.K, col("c").desc, col("dst").asc)
        .select(col("src"), col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nExactKnn = exactKnn.count()

      val arms = Seq("off", "on").map { mode =>
        sys.props("graft.lsh.whiten") = mode
        // candidate volume at identical B/L: collision rows of the
        // dd07/sim09 bucket topology under this mode's hashing view
        import org.apache.spark.sql.graftx.functions.l2_norm
        val e = e0.select(col("vec_id"), col("embedding"),
          l2_norm(col("embedding")).as("nrm"))
        val hv =
          if (mode == "off") col("embedding")
          else Whitening.whitenCol(col("embedding"), sp)
        val own = e.select(col("vec_id"),
          posexplode(sign_buckets(hv, b, 8)).as(Seq("tbl", "bucket")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val probe = own.select(col("vec_id"), col("tbl"),
          explode(array(col("bucket") +: (0 until b).map(x =>
            col("bucket").bitwiseXOR(lit(1L << x))): _*)).as("bucket"))
        val volume = probe.as("x").join(own.hint("merge").as("y"),
            col("x.tbl") === col("y.tbl") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .count()
        own.unpersist(blocking = false)
        // dd07 recall vs the exact sampled pairs, split by cosine band
        val foundPairs = Dedup.embedNearDupLsh(spark, dir)
          .select(col("v1"), col("v2"))
          .join(exactPairs, Seq("v1", "v2"), "left_semi")
          .join(exactPairs, Seq("v1", "v2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val found = foundPairs.count()
        val foundMarginal = foundPairs
          .filter(col("cos_r") >= 0.45 && col("cos_r") < 0.7).count()
        val foundHigh = foundPairs.filter(col("cos_r") >= 0.85).count()
        foundPairs.unpersist(blocking = false)
        def rec(f: Long, n0: Long) = if (n0 == 0) 1.0 else f.toDouble / n0
        val dd07Recall = rec(found, nExact)
        val dd07RecallMarginal = rec(foundMarginal, nMarginal)
        val dd07RecallHigh = rec(foundHigh, nHigh)
        // sim09 wall + recall vs the 32-source exact probe
        val t0 = System.nanoTime()
        val g = Similarity.knnGraphLsh(spark, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        g.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val hits = g.select(col("src"), col("dst"))
          .join(exactKnn, Seq("src", "dst"), "left_semi").count()
        val s9Recall =
          if (nExactKnn == 0) 1.0 else hits.toDouble / nExactKnn
        g.unpersist(blocking = false)
        s""""$mode":{"candidate_rows":$volume,""" +
          s""""dd07_recall":${jnum(dd07Recall)},""" +
          s""""dd07_recall_marginal":${jnum(dd07RecallMarginal)},""" +
          s""""dd07_recall_high":${jnum(dd07RecallHigh)},""" +
          s""""sim09_recall":${jnum(s9Recall)},""" +
          s""""sim09_wall_s":${jnum(wall)}}"""
      }
      spark.catalog.clearCache()
      s""""$fname":{"n":$n,"B":$b,"skew":${jnum(sp.skew)},""" +
        s""""n_exact_marginal":$nMarginal,"n_exact_high":$nHigh,""" +
        s""""eigvals":[${sp.eigvals.map(jnum).mkString(",")}],""" +
        s""""mean_var":${jnum(sp.meanVar)},"auto":"$autoDecision",""" +
        s""""n_exact_pairs":$nExact,${arms.mkString(",")}}"""
    }
    val json = s"""{"metric":"whiten_adoption","threshold":${Whitening.SkewThreshold},""" +
      s""""protocol":"same B/L both arms; hashing view only, rescore raw",""" +
      parts.mkString("", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_whiten.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
