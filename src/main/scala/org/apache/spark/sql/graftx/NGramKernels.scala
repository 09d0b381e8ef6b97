package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character n-gram counts, natively:
  * `char_ngram_counts(t, 3)` = `array<struct<g: string, cnt: bigint>>`,
  * one entry per distinct length-n substring of `t` with its occurrence
  * count — i.e. the (doc, gram) -> count aggregate computed inside the
  * scan, in one byte pass, with no explode and no shuffle.
  *
  * The composable formulation — `explode(transform(sequence(1, len-2),
  * i -> substring(t, i, 3)))` then `groupBy(doc, g).count()` — pays an
  * interpreted higher-order lambda (~1.3 us/gram measured) AND a
  * corpus-sized hash aggregate whose keys are (doc, gram) strings. This
  * kernel needs neither: within-document aggregation happens in a local
  * hash map (documents are single rows, so the "group" never spans
  * partitions), and what leaves the scan is already the aggregate —
  * at 100 TB the difference between shuffling per-occurrence gram rows
  * and shuffling per-document summaries.
  *
  * Count semantics are exactly the composable formulation's (every
  * window, including overlapping ones, counts once); entry order in the
  * output array is first-occurrence order, which downstream aggregates
  * ignore. Cross-engine parity: DuckDB's
  * `unnest(list_transform(range(...), i -> substr(t, i, n)))` + GROUP BY
  * produces the same multiset of (g, cnt).
  */
case class CharNGramCounts(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= 16)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_ngram_counts"

  override def nullSafeEval(input: Any): Any =
    CharNGramCounts.countsArrayData(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = CharNGramCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = $cls.countsArrayData($c.toString(), $n);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNGramCounts {
  /** Codegen entry point: distinct n-grams with counts as Catalyst rows.
    * Gram boundaries are CODE POINTS, not UTF-16 units — Spark's
    * `substring` and DuckDB's `substr` are both code-point based, and a
    * supplementary character (emoji etc.) split across a surrogate pair
    * would otherwise shift every downstream gram and break the oracle. */
  def countsArrayData(text: String, n: Int): GenericArrayData = {
    val nCp = text.codePointCount(0, text.length)
    if (nCp < n) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[String, Long]()
    // sliding window over UTF-16 offsets of code-point boundaries:
    // start = offset of cp i, end = offset of cp i+n
    var start = 0
    var end = text.offsetByCodePoints(0, n)
    var i = 0
    while (i <= nCp - n) {
      val g = text.substring(start, end)
      val cur = counts.get(g)
      counts.put(g, if (cur == null) 1L else cur + 1L)
      i += 1
      if (i <= nCp - n) {
        start = text.offsetByCodePoints(start, 1)
        end = text.offsetByCodePoints(end, 1)
      }
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** MinHash signature of a shingle array, natively:
  * `minhash_sig(sh, 128)` = `array<bigint>` where slot i =
  * `min over sh of xxhash64(i, s)` — the per-row single-pass signature.
  *
  * Hash chain is EXACTLY Spark's `xxhash64(lit(i), s)` (seed 42, int
  * literal folded in first), so signatures are bit-identical to both the
  * exploded 128-column aggregate formulation (dd03's original shape) and
  * the streaming HOF formulation (DocPipeline.nearDupPairs) — batch and
  * streaming LSH stay mutually compatible. Unlike the grouped-aggregate
  * formulation there is no corpus-wide explode and no 128-column-wide
  * UnsafeRow exchange: the signature is born in the scan projection.
  *
  * The per-perm chain seed (`xxhash64` of the int literal alone) is
  * data-independent and precomputed once per expression instance.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numPerms >= 1 && numPerms <= 1024)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // xxhash64(i) chain prefix per permutation — constant w.r.t. data
  @transient private lazy val seeds: Array[Long] =
    MinHashSig.permSeeds(numPerms)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sigArrayData(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = $cls.sigArrayData($c, $seedsRef);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  def permSeeds(numPerms: Int): Array[Long] = {
    val seeds = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      seeds(i) = XxHash64Function.hash(i, IntegerType, 42L)
      i += 1
    }
    seeds
  }

  /** Codegen entry point: per-perm min of the chained string hash. */
  def sigArrayData(sh: ArrayData, seeds: Array[Long]): GenericArrayData = {
    val numPerms = seeds.length
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = sh.numElements()
    var j = 0
    while (j < n) {
      val s = sh.getUTF8String(j)
      var i = 0
      while (i < numPerms) {
        val h = XxHash64Function.hash(s, StringType, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

object NGramFunctions {
  /** Column-API entry point for [[CharNGramCounts]]. */
  def char_ngram_counts(c: Column, n: Int): Column =
    ExpressionUtils.column(
      CharNGramCounts(ExpressionUtils.expression(c), n))

  /** Column-API entry point for [[MinHashSig]]. */
  def minhash_sig(c: Column, numPerms: Int): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(c), numPerms))
}
