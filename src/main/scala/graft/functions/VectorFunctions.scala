package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as codegen-friendly
  * Column expressions (no UDFs — array lambdas stay inside WholeStageCodegen
  * and never serialize to the JVM heap as Scala closures).
  *
  * Determinism note: every kernel folds elements strictly left-to-right in
  * double precision, so results are bit-identical across partitionings,
  * retries, and engines — required by the DuckDB-oracle gate and by
  * reproducible 100 TB runs.
  */
object VectorFunctions {

  /** Left-to-right double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native fused Catalyst expression (one allocation-free
    * codegen'd pass). Bit-identical to [[cosineComposable]] — asserted in
    * the test suite — so the DuckDB oracles hold for either. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.functions.cosine_sim(a, b)

  /** Reference formulation from built-in lambdas only (3 passes + a
    * materialized intermediate array; kept as the semantic baseline). */
  def cosineComposable(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val dv = x.cast("double") - y.cast("double"); dv * dv
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Sign-LSH bucket ids: delegates to the native single-pass
    * [[org.apache.spark.sql.graftx.SignBuckets]] expression (splitmix64-
    * derived hyperplanes, no broadcast side data). */
  def signBuckets(vec: Column, planes: Int, tables: Int): Column =
    org.apache.spark.sql.graftx.SignBucketsFunctions
      .sign_buckets(vec, planes, tables)
}
