package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** gx01/gx02 carry bit-exact DuckDB oracles (the driver gate); these
  * specs pin what the oracle cannot: the ITERATION math against an
  * independent single-machine recompute (the oracle unrolls the same
  * CTE chain, so a shared spec bug would cancel out — the Scala
  * recompute here shares nothing with either side), the plan shapes
  * that decide 100 TB survival, and determinism across runs. */
class GraphSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()
  val sf = "/root/testdata/sf0.001"

  private val Scale = 1000000L

  /** τ=0.5 undirected edge set straight off the (already oracled) pair
    * kernel — the graph both queries are defined on. */
  private def edgeSet(): Set[(Long, Long)] =
    operators.Dedup.jaccardGraph(spark, sf, 0.5)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Single-machine PageRank with the exact integer spec: rank0 = 1e6,
    * per-edge floor(0.85 * (r div deg)) via the split-multiply identity,
    * rank' = 150000 + sum, 5 iterations. Plain Scala Longs and maps —
    * no Spark, no SQL. */
  private def brutePagerank(edges: Set[(Long, Long)],
      iters: Int = 5): Map[Long, (Long, Long)] = {
    val dir = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = dir.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var r = deg.keys.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val in = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) =>
          val c = r(u) / deg(u)
          (c / Scale) * 850000L + ((c % Scale) * 850000L) / Scale
        }.sum
      }
      r = deg.keys.map(v => v -> (150000L + in.getOrElse(v, 0L))).toMap
    }
    r.map { case (v, rank) => v -> (deg(v), rank) }
  }

  test("gx01: ranks equal the independent pure-Scala integer recompute " +
      "exactly (node set, degrees, micro-unit ranks)") {
    val got = SparkEntry.queries("gx01_pagerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    val want = brutePagerank(edgeSet())
    spark.catalog.clearCache()
    assert(want.nonEmpty, "fixture must yield a non-empty τ=0.5 graph")
    assert(got == want)
  }

  test("gx01: teleport floor and mass sanity — every rank >= 150000, " +
      "and total mass stays within the floor-loss band") {
    val rows = SparkEntry.queries("gx01_pagerank")(spark, sf).collect()
    spark.catalog.clearCache()
    val n = rows.length.toLong
    assert(rows.forall(_.getLong(2) >= 150000L))
    // each of the 5 iterations loses < 1 micro-unit per edge-end to the
    // two floors plus the per-node teleport remainder; mass can only
    // leak DOWN from n * Scale
    val mass = rows.map(_.getLong(2)).sum
    assert(mass <= n * Scale)
    assert(mass > (n * Scale * 8) / 10, s"mass $mass vs n=$n")
  }

  test("gx02: triangle counts equal the brute-force enumeration and " +
      "LCC is the exact integer quotient") {
    val got = SparkEntry.queries("gx02_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    val edges = edgeSet()
    spark.catalog.clearCache()
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq
    val triPerNode = nodes.map { u =>
      val nb = adj(u).toSeq
      u -> (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if edges.contains((nb(i) min nb(j), nb(i) max nb(j)))
      } yield 1).size.toLong
    }.toMap
    val want = nodes.map { u =>
      val d = adj(u).size.toLong
      val t = triPerNode(u)
      val lcc = if (d >= 2) (t * 2L * Scale) / (d * (d - 1L)) else 0L
      u -> (t, lcc)
    }.toMap
    assert(want.exists(_._2._1 > 0L),
      "fixture must contain at least one triangle")
    assert(got == want)
  }

  test("gx01/gx02 plans: node-sized relations never broadcast, edge " +
      "probe partitioning reused across iterations") {
    val p1 = SparkEntry.queries("gx01_pagerank")(spark, sf)
      .queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    // ranks/degrees are ~16 GB at 1e9 docs — over the broadcast cap;
    // every join must stay a shuffle join at any scale
    assert(!p1.contains("BroadcastHashJoin"), p1)
    assert(!p1.contains("CartesianProduct"), p1)
    // the persisted (u, v, deg) probe must appear as an in-memory scan
    // (built once), not 5 re-mines of the pair kernel
    assert(p1.contains("InMemoryTableScan"), p1)
    val p2 = SparkEntry.queries("gx02_triangles")(spark, sf)
      .queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    assert(!p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
    assert(p2.contains("InMemoryTableScan"), p2)
  }

  test("gx01: deterministic across runs (bit-identical output)") {
    val q = SparkEntry.queries("gx01_pagerank")
    val a = q(spark, sf).collect().map(_.toString).sorted
    spark.catalog.clearCache()
    val b = q(spark, sf).collect().map(_.toString).sorted
    spark.catalog.clearCache()
    assert(a.sameElements(b))
  }
}
