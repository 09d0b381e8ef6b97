package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a document, natively.
  *
  * Semantics match the composable formulation used by the DuckDB oracle:
  * tokens are maximal `[a-z0-9]+` runs of `lower(text)` (the character
  * class is ASCII-only, so non-ASCII characters act as separators under
  * both formulations), shingles are `n` consecutive tokens joined by a
  * single space, deduplicated. Known divergence: the handful of non-ASCII
  * characters whose case-folding crosses into ASCII via multi-character
  * expansion (e.g. Turkish dotted I, which lowercases to "i" + combining
  * mark in full string folding but to plain 'i' per-character) can merge
  * adjacent tokens here that the regex formulation splits — irrelevant for
  * ASCII corpora and asserted equivalent on Latin-1/CJK in the spec.
  *
  * The lambda formulation (regexp_extract_all + transform + concat_ws +
  * array_distinct) is interpreted — higher-order functions have no
  * codegen — and costs ~0.6 ms/doc; this single byte-pass is the shingling
  * kernel every content-dedup query starts from, i.e. pure scan-side CPU
  * at 100 TB.
  */
case class WordShingles(child: Expression, n: Int,
    distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1 && n <= 16)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordShingles.shingle(input.asInstanceOf[UTF8String].toString, n,
          distinct)
        .map(UTF8String.fromString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        |${ev.value} = $cls.shingleArrayData($c.toString(), $n, $distinct);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  def shingle(text: String, n: Int): Array[String] =
    shingle(text, n, distinct = true)

  /** `distinct = false` keeps every occurrence in order — the frequency-
    * preserving mode tx12's repetition statistics need (a dedup kernel
    * cannot express "most frequent bigram"). */
  def shingle(text: String, n: Int, distinct: Boolean): Array[String] = {
    // tokenize: maximal [a-z0-9]+ runs of the lowercased text
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    val len = text.length
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= len) {
      val c = if (i < len) Character.toLowerCase(text.charAt(i)) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (toks.length < n) return Array.empty[String]
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String]()
      var j = 0
      while (j <= toks.length - n) {
        val b = new java.lang.StringBuilder(toks(j))
        var k = 1
        while (k < n) { b.append(' ').append(toks(j + k)); k += 1 }
        seen.add(b.toString)
        j += 1
      }
      val out = new Array[String](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      out
    } else {
      val out = new Array[String](toks.length - n + 1)
      var j = 0
      while (j <= toks.length - n) {
        val b = new java.lang.StringBuilder(toks(j))
        var k = 1
        while (k < n) { b.append(' ').append(toks(j + k)); k += 1 }
        out(j) = b.toString
        j += 1
      }
      out
    }
  }

  /** Codegen entry point returning Catalyst ArrayData directly. */
  def shingleArrayData(text: String, n: Int,
      distinct: Boolean): GenericArrayData =
    new GenericArrayData(shingle(text, n, distinct).map(UTF8String.fromString))
}

object WordShinglesFunctions {
  def word_shingles(c: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(c), n))

  /** Order- and frequency-preserving word n-grams (non-distinct). */
  def word_grams(c: Column, n: Int): Column =
    ExpressionUtils.column(
      WordShingles(ExpressionUtils.expression(c), n, distinct = false))
}
