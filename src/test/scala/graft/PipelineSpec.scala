package graft

import org.scalatest.funsuite.AnyFunSuite

/** pp01 corpus-prep capstone: lineage sanity + the read-once contract.
  * Cross-engine correctness (every stage count and fingerprint vs the
  * nine-stage DuckDB CTE replay) is the driver gate's job; these pin
  * the engine-side structural properties the oracle cannot see. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  test("pp01: lineage is complete, doc stages are monotone, counts chain") {
    val (lineage, _) = operators.Pipeline.run(spark, sf)
    spark.catalog.clearCache()
    assert(lineage.map(_._2) == Seq("quality", "dedup", "span_dedup",
      "decontaminate", "mixture", "split_train", "shuffle", "bpe_segment",
      "pack"))
    // every stage's rows_in equals the previous stage's rows_out
    lineage.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._4, s"${b._2}: rows_in ${b._3} != ${a._2} out ${a._4}")
    }
    // filter stages only ever shrink; shuffle/segment preserve counts
    lineage.filter(l => l._1 <= 6).foreach(l =>
      assert(l._4 <= l._3, s"${l._2} grew the corpus"))
    val byName = lineage.map(l => l._2 -> l).toMap
    assert(byName("shuffle")._3 == byName("shuffle")._4)
    assert(byName("bpe_segment")._3 == byName("bpe_segment")._4)
    // something must survive the whole pipeline at sf0.001
    assert(byName("pack")._4 > 0, "empty packed corpus")
  }

  test("pp01: READ-ONCE — no stage's executed plan re-scans parquet; " +
      "every input flows from a persisted parent") {
    val (_, frames) = operators.Pipeline.run(spark, sf)
    try {
      // walk the executed TREE (through AQE's plan/stage wrappers): a
      // FileSourceScanExec node is a real parquet read; the FileScan
      // text nested inside an InMemoryRelation's rendering is just the
      // cache's build plan and must not count
      import org.apache.spark.sql.execution.SparkPlan
      def walk(p: SparkPlan): (Int, Int) = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          (0, 0) // its original was counted where it was planned
        case _: org.apache.spark.sql.execution.FileSourceScanExec => (1, 0)
        case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          (0, 1)
        case o => o.children.map(walk)
          .foldLeft((0, 0))((x, y) => (x._1 + y._1, x._2 + y._2))
      }
      frames.foreach { case (name, df) =>
        val exec = df.queryExecution.executedPlan
        val (fileScans, cachedScans) = walk(exec)
        assert(fileScans == 0, s"stage $name re-reads parquet:\n$exec")
        assert(cachedScans > 0,
          s"stage $name does not read a cached parent:\n$exec")
      }
    } finally spark.catalog.clearCache()
  }
}
