package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Unit semantics of the reusable backward as-of join. */
class JoinsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  import spark.implicits._

  test("asofBackward: latest prior-or-simultaneous match, nulls otherwise") {
    val trades = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "B", 15L), (4L, "A", 5L)
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (101L, "A", 8L, 1.0), (102L, "A", 10L, 2.0), (103L, "A", 18L, 3.0),
      (104L, "B", 99L, 9.0)
    ).toDF("quote_id", "sym", "t", "px")

    val m = Joins.asofBackward(trades, quotes, key = "sym", ts = "t")
      .select("trade_id", "quote_id_matched", "px_matched")
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) -1L else r.getLong(1)),
        (if (r.isNullAt(2)) -1.0 else r.getDouble(2)))).toMap
    assert(m(1L) == (102L, 2.0)) // simultaneous quote wins (<=)
    assert(m(2L) == (103L, 3.0)) // latest prior
    assert(m(3L) == (-1L, -1.0)) // B's only quote is later -> null
    assert(m(4L) == (-1L, -1.0)) // before any quote -> null
  }

  test("asofBackward: tie-break picks the highest tie column at equal ts") {
    val l = Seq((1L, "K", 10L)).toDF("lid", "k", "t")
    val r = Seq((5L, "K", 10L, "x"), (7L, "K", 10L, "y"))
      .toDF("rid", "k", "t", "v")
    val out = Joins.asofBackward(l, r, key = "k", ts = "t",
        tieBreak = Seq("rid"))
      .select("lid", "rid_matched", "v_matched").collect()(0)
    // window order: ts, is_right desc, rid asc -> last carried = rid 7
    assert(out.getLong(1) == 7L && out.getString(2) == "y")
  }
}
