package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate row: (item, score). */
case class ScoredItem(vec_id: Long, cos_r: Double)

/** Typed top-k-per-key aggregator (the UDAF tier of the operator model,
  * SURVEY.md §2.7).
  *
  * Versus the `row_number().over(Window)` formulation, an Aggregator gets
  * map-side partial aggregation for free: every partition forwards AT MOST
  * k candidates per key into the exchange, instead of shuffling every
  * candidate row and sorting per partition. For a top-5 over millions of
  * candidates per key — the ANN re-rank shape at 100 TB — the shuffle
  * shrinks by orders of magnitude.
  *
  * Ordering: score descending, item id ascending (total order, so results
  * are deterministic and engine-comparable).
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredItem, List[ScoredItem], Seq[ScoredItem]] {

  private def lt(a: ScoredItem, b: ScoredItem): Boolean =
    a.cos_r > b.cos_r || (a.cos_r == b.cos_r && a.vec_id < b.vec_id)

  private def insert(buf: List[ScoredItem], x: ScoredItem): List[ScoredItem] = {
    val (pre, post) = buf.span(lt(_, x))
    val merged = pre ::: (x :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[ScoredItem] = Nil
  override def reduce(b: List[ScoredItem], a: ScoredItem): List[ScoredItem] =
    insert(b, a)
  override def merge(b1: List[ScoredItem],
      b2: List[ScoredItem]): List[ScoredItem] = b2.foldLeft(b1)(insert)
  override def finish(r: List[ScoredItem]): Seq[ScoredItem] = r

  override def bufferEncoder: Encoder[List[ScoredItem]] =
    Encoders.kryo[List[ScoredItem]]
  override def outputEncoder: Encoder[Seq[ScoredItem]] =
    ExpressionEncoder[Seq[ScoredItem]]()
}
