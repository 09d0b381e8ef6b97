package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Punch-item experiment (VERDICT r10 #6): does a PCA whitening rotation
  * in front of sign-LSH plane generation buy recall at equal candidate
  * cost? em01/em02 exist as queries; their stated purpose (whitening for
  * embedding search / SemDeDup) is exercised here against the fixture.
  *
  * Protocol: ground truth = exact top-K cosine neighbors (driver-side
  * O(N²), fixture-sized). Both arms hash with the SAME (B, L, B+1
  * multiprobe) sign-LSH the sim09/dd07 pipelines use; the whitened arm
  * hashes x' = x + Σ_c ((sqrt(λ̄/λ_c) − 1)·(x·u_c))·u_c over the top
  * PcaK eigenpairs (variance equalized along the dominant directions —
  * rescoring would stay on the originals, so ONLY co-bucketing
  * changes). Report: pair recall@K and candidate volume per arm. The
  * adopt/reject decision and numbers land in PLANS.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PcaRotateBench [K]"
  */
object PcaRotateBench {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val K = args.headOption.map(_.toInt).getOrElse(5)
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
    import spark.implicits._
    import org.apache.spark.sql.graftx.SignBucketsFunctions.sign_buckets

    // arg 2 = "planted": synthetic strongly-anisotropic corpus (one
    // direction carrying ~50x the per-axis variance) — the regime
    // whitening exists for, so the fixture verdict has a positive
    // control next to it.
    val raw: Array[(Long, Array[Double])] =
      if (args.lift(1).contains("planted")) {
        val dimP = 64
        val u = {
          val v = Array.tabulate(dimP)(j =>
            (if (j % 2 == 0) 1.0 else -1.0) / math.sqrt(dimP))
          v
        }
        Array.tabulate(5000) { i =>
          val a = ((i * 131) % 1000 - 500) * 0.02
          (i.toLong, Array.tabulate(dimP)(j =>
            a * u(j) + ((i * 31 + j * 7) % 11 - 5) * 0.02))
        }
      } else graft.core.Tables(spark, d, "embeddings")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
    val n = raw.length
    val dim = raw.head._2.length

    // ---- exact top-K ground truth (driver, double precision) ----
    val nrm = raw.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }
    val truth = scala.collection.mutable.Set.empty[(Long, Long)]
    for (i <- 0 until n) {
      val cos = Array.tabulate(n) { j =>
        if (i == j) -2.0
        else raw(i)._2.zip(raw(j)._2).map(t => t._1 * t._2).sum /
          (nrm(i) * nrm(j))
      }
      cos.zipWithIndex.sortBy(t => (-t._1, t._2)).take(K).foreach { case (_, j) =>
        truth += ((raw(i)._1, raw(j)._1))
      }
    }

    // ---- PCA eigenpairs (double power iteration + deflation; the
    // experiment arm only — production would read em01's integers) ----
    val mean = Array.tabulate(dim)(j => raw.map(_._2(j)).sum / n)
    val cov = Array.tabulate(dim, dim) { (j, k) =>
      raw.map(r => (r._2(j) - mean(j)) * (r._2(k) - mean(k))).sum / n
    }
    val work = cov.map(_.clone())
    val comps = (0 until 4).map { _ =>
      var v = Array.fill(dim)(1.0)
      for (_ <- 1 to 100) {
        val u = Array.tabulate(dim)(j =>
          (0 until dim).map(k => work(j)(k) * v(k)).sum)
        val l2 = math.sqrt(u.map(x => x * x).sum)
        if (l2 > 0) v = u.map(_ / l2)
      }
      val lam = (0 until dim).map(j =>
        (0 until dim).map(k => work(j)(k) * v(k)).sum * v(j)).sum
      for (j <- 0 until dim; k <- 0 until dim)
        work(j)(k) -= lam * v(j) * v(k)
      (v, lam)
    }
    val lamBar = (0 until dim).map(j => cov(j)(j)).sum / dim
    println(f"PCA eigvals: ${comps.map(_._2).map(l => f"$l%.4f").mkString(", ")}; mean diag $lamBar%.4f")

    def whiten(x: Array[Double]): Array[Double] = {
      val out = x.clone()
      comps.foreach { case (u, lam) =>
        if (lam > 1e-12) {
          val proj = x.zip(u).map(t => t._1 * t._2).sum
          val g = (math.sqrt(lamBar / lam) - 1.0) * proj
          for (j <- 0 until dim) out(j) += g * u(j)
        }
      }
      out
    }

    // ---- co-bucketing recall per arm at identical (B, L, multiprobe) ----
    val B = graft.operators.Scale.lshPlanes(n.toLong)
    val L = 8
    def arm(label: String, vecs: Array[(Long, Array[Float])]): Unit = {
      val df = spark.createDataset(vecs.toSeq).toDF("vec_id", "embedding")
      val own = df.select(col("vec_id"),
        posexplode(sign_buckets(col("embedding"), B, L))
          .as(Seq("tbl", "bucket")))
      val probe = own.select(col("vec_id"), col("tbl"),
        explode(array(col("bucket") +: (0 until B).map(b =>
          col("bucket").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
      val cand = probe.as("x").join(own.as("y"),
          col("x.tbl") === col("y.tbl") &&
            col("x.bucket") === col("y.bucket") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("u"), col("y.vec_id").as("v"))
      val pairs = cand.distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val vol = cand.count()
      val hit = truth.count(pairs.contains)
      println(f"""{"metric":"pca_rotate","arm":"$label","B":$B,"L":$L,"candidate_rows":$vol,"distinct_pairs":${pairs.size},"truth_pairs":${truth.size},"recall":${hit.toDouble / truth.size}%.4f}""")
    }
    arm("baseline", raw.map { case (id, v) => (id, v.map(_.toFloat)) })
    arm("whitened", raw.map { case (id, v) => (id, whiten(v).map(_.toFloat)) })
    spark.stop()
  }
}
