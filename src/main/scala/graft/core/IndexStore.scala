package graft.core

import org.apache.spark.sql.SparkSession

/** Location + existence contract for persisted derived artifacts that are
  * built once and consumed many times (ANN indexes, mined pair tables).
  * Local-relative by default; a deployment points SPARK_GRAFT_INDEX_DIR at
  * shared storage (HDFS/S3 — all access goes through the Hadoop FS API).
  * Keyed by the source data directory (one store per dataset) and a layout
  * version prefix, so a layout change invalidates cleanly.
  */
object IndexStore {

  def root(d: String): String = {
    val key = d.replaceAll("[^A-Za-z0-9.]+", "_").dropWhile(_ == '_')
    // v2: k-means assignment moved to the native NearestCentroid
    // expression (squared-distance compare) — a v1 IVF index persisted by
    // the struct/sqrt formulation could disagree on exact-tie cells, and
    // the probe/fused bit-identity contract requires index and query to
    // share one assignment code path.
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "target/graft_index") +
      s"/v2_$key"
  }

  /** A parquet artifact counts as present only with its _SUCCESS marker —
    * a killed build leaves a partial directory that must be rebuilt. */
  def ready(s: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The build-once/read-many choreography for a SINGLE parquet
    * artifact: readiness via the _SUCCESS marker, overwrite-write on
    * first touch, read-back for every consumer. One home for the
    * pattern (dd09's pair table, the gx edge table) so a future fix to
    * the atomicity contract lands once; the multi-artifact index builds
    * (IVF cells + centroids, PQ codebook + codes) keep their own
    * sequencing because readiness there spans several writes. */
  def loadOrBuild(s: SparkSession, path: String)(
      build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    if (!ready(s, path)) build.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }
}
