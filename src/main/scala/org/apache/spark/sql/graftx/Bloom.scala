package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column-API surface over Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind runtime join row filtering). Spark ships them unregistered —
  * they are internal to `InjectRuntimeFilter` — so this exposes the
  * vetted implementations rather than re-deriving a sketch.
  *
  * Scale role (tx17): a membership set that is too large to broadcast as
  * raw values compresses into a FIXED-SIZE bit array (~9.6 bits/item at
  * 1% fpp vs the full string payload), with one-sided error: a Bloom
  * probe never misses a true member, it can only over-report. Consumers
  * therefore get a guaranteed-superset filter, the same contract
  * Spark's own runtime filtering relies on.
  */
object BloomFunctions {

  /** Aggregate `c` (must be LongType — xxhash64 the raw values) into a
    * binary Bloom filter sized for `items` expected members and `bits`
    * filter bits. */
  def bloom_filter_agg(c: Column, items: Long, bits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(c),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** True iff `v` (LongType, same hashing as the build side) may be a
    * member of the filter `f`; false is authoritative. */
  def might_contain(f: Column, v: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(f), ExpressionUtils.expression(v)))
}
