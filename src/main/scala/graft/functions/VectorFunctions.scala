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

  /** Random-hyperplane (sign) LSH bucket for cosine similarity: bit p of
    * the result is the sign of the projection onto pseudo-random plane p.
    * Planes are derived from `xxhash64(seed, p, dim)` so the "random"
    * matrix is deterministic, reproducible, and needs no broadcast side
    * data — every executor recomputes its slice of the matrix inline.
    * `seed` selects an independent hash table (standard multi-table LSH).
    */
  def signBucket(vec: Column, planes: Int, seed: Int = 0): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(63)), (x, d) =>
          x.cast("double") *
            when(xxhash64(lit(seed), lit(p), d).bitwiseAND(lit(1L)) === 1L,
              1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, expr(s"CAST(1 AS BIGINT) << $p")).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
}
