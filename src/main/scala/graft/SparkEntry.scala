package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle maps. Every operator claimed done
  * in SURVEY.md §2 has a `queries` entry here; SQL-expressible ones also
  * carry a DuckDB oracle.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (Relational.queries, Relational.oracleSql),
    (Relational2.queries, Relational2.oracleSql),
    (RainStormOps.queries, RainStormOps.oracleSql),
    (Grep.queries, Grep.oracleSql),
    (TextAnalysis.queries, TextAnalysis.oracleSql),
    (Dedup.queries, Dedup.oracleSql),
    (Similarity.queries, Similarity.oracleSql),
    (Multimodal.queries, Multimodal.oracleSql),
    (Events.queries, Events.oracleSql),
    (Graphs.queries, Graphs.oracleSql),
    (Learn.queries, Learn.oracleSql),
    (Bpe.queries, Bpe.oracleSql),
    (Pipeline.queries, Pipeline.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
