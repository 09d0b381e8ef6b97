package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{GraftFunctions, WinnowFingerprint}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the winnowing fingerprint (kernel + expression paths),
  * checked over seeded random samples. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randText(max: Int): String =
    Seq.fill(rnd.nextInt(max))(
      if (rnd.nextInt(5) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar
    ).mkString

  test("deterministic: same text -> same fingerprints") {
    (1 to 100).foreach { _ =>
      val t = randText(200)
      assert(WinnowFingerprint.winnow(t.getBytes("UTF-8")).toSeq ==
        WinnowFingerprint.winnow(t.getBytes("UTF-8")).toSeq)
    }
  }

  test("guarantee: any shared substring of length >= W+K-1 shares a pick") {
    val shared = "the quick brown fox jumps over the lazy dog!"
    assert(shared.length >= WinnowFingerprint.W + WinnowFingerprint.K - 1)
    (1 to 100).foreach { _ =>
      val pre = randText(120)
      val post = randText(120)
      val a = WinnowFingerprint.winnow((pre + shared).getBytes("UTF-8")).toSet
      val b = WinnowFingerprint.winnow((shared + post).getBytes("UTF-8")).toSet
      assert(a.intersect(b).nonEmpty)
    }
  }

  test("short inputs (< K bytes) fingerprint to empty, not crash") {
    assert(WinnowFingerprint.winnow("1234567".getBytes).isEmpty)
    assert(WinnowFingerprint.winnow(Array.empty[Byte]).isEmpty)
  }

  test("expression path (codegen) == kernel, and SQL registration works") {
    val docs = Seq((1L, "spark streaming join order batch the fast key"),
      (2L, "a completely different document about nothing at all"))
      .toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), GraftFunctions.winnow_fingerprint(col("text"))
        .as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { _ => () } // force nothing; direct kernel compare below
    Seq((1L, "spark streaming join order batch the fast key"),
      (2L, "a completely different document about nothing at all"))
      .foreach { case (id, t) =>
        assert(viaExpr(id) == WinnowFingerprint.winnow(t.getBytes("UTF-8")).toSeq)
      }
    // SQL surface via extensions-equivalent registration
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprint",
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graftx.WinnowFingerprint(es.head), "built-in")
    docs.createOrReplaceTempView("wdocs")
    val viaSql = spark.sql(
      "SELECT doc_id, winnow_fingerprint(text) AS fp FROM wdocs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaExpr)
  }

  test("near-dup docs share winnow picks; unrelated docs share none") {
    val base = "spark group query row data slow small filter customer line " +
      "the batch value merge line table data stream join order"
    val nearDup = base.replace("slow", "fast")
    val other = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm"
    val fpBase = WinnowFingerprint.winnow(base.getBytes).toSet
    val fpNear = WinnowFingerprint.winnow(nearDup.getBytes).toSet
    val fpOther = WinnowFingerprint.winnow(other.getBytes).toSet
    assert(fpBase.intersect(fpNear).size >= 2)
    assert(fpBase.intersect(fpOther).isEmpty)
  }
}
