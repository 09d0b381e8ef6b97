package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable join operators beyond Spark's built-in surface. */
object Joins {

  /** Backward as-of join: for every left row, attach the LATEST right row
    * with `right.ts <= left.ts` for the same key (ties: the right row wins
    * — "prior-or-simultaneous"). Rows with no prior match keep null right
    * columns.
    *
    * Formulation: union both sides into one per-key stream and carry the
    * most recent right payload forward with `last(_, ignoreNulls)` over a
    * (key, ts) window — one shuffle on the key, one per-partition sort,
    * linear scan. No per-row range probe, no join fan-out, skew-safe
    * under AQE; this is the shape that survives a 100x scale-up where a
    * naive theta-join (`l.ts >= r.ts`) degenerates to a cross product.
    *
    * Output: all left columns plus the right payload columns suffixed
    * `rightSuffix`.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightSuffix: String = "_matched",
      tieBreak: Seq[String] = Nil): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(c => c == key || c == ts)
    // tie-break values live in a dedicated column: right rows carry their
    // tie tuple (ordering among same-ts right rows), left rows carry null
    // (irrelevant — __is_right already orders right before left at a tie)
    val tieType = org.apache.spark.sql.types.StructType(
      tieBreak.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("__is_right", lit(0))
      .withColumn("__rpay", lit(null)
        .cast(org.apache.spark.sql.types.StructType(
          right.drop(key, ts).schema.fields)))
      .withColumn("__tie",
        if (tieBreak.isEmpty) lit(0) else lit(null).cast(tieType))
    val rTagged = right
      .withColumn("__is_right", lit(1))
      .withColumn("__rpay", struct(rCols.map(col): _*))
      .withColumn("__tie",
        if (tieBreak.isEmpty) lit(0) else struct(tieBreak.map(col): _*))
      .select(Seq(key, ts, "__is_right", "__rpay", "__tie").map(col): _*)
    // align right to the left schema (left payload nulls on right rows)
    val rAligned = lCols
      .filterNot(c => c == key || c == ts)
      .foldLeft(rTagged) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select((lCols ++ Seq("__is_right", "__rpay", "__tie")).map(col): _*)
    val unioned = lTagged.select(
      (lCols ++ Seq("__is_right", "__rpay", "__tie")).map(col): _*)
      .unionByName(rAligned)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__is_right").desc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__last_r",
      last(when(col("__is_right") === 1, col("__rpay")), ignoreNulls = true)
        .over(w))
    carried.filter(col("__is_right") === 0)
      .select(lCols.map(col) ++
        rCols.map(c => col(s"__last_r.$c").as(s"$c$rightSuffix")): _*)
  }
}
