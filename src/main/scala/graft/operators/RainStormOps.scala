package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch twins of the reference's canonical RainStorm pipelines.
  *
  * The reference ships exactly two app shapes (reports/Streaming.pdf p.2-3):
  *  - "simple"  = regex filter -> project two columns
  *    (tests/sample1_op1.py:8-13 + tests/sample1_op2.py:7-16,
  *     fused in tests/mp4_demo1.py:8-15);
  *  - "complex" = column-equality filter -> stateful count-by-key
  *    (tests/sample2_op1.py:8-16 + tests/sample2_op2.py:6-20).
  *
  * Expressed over the `documents` table (the text-corpus analogue of the
  * reference's Traffic Signs CSV). The streaming versions with per-update
  * emission semantics live in [[graft.streaming.RainStormJob]]; these batch
  * twins define the final-state answer the streaming run must converge to —
  * the parity criterion SURVEY.md §7.4(1) sets.
  */
object RainStormOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P2 (the "simple app"): regex filter then projection. Catalyst fuses
    // these into one scan with the rlike evaluated in WholeStageCodegen.
    "rs01_simple_app" -> ((s, d) => {
      Tables(s, d, "documents")
        .filter(col("text").rlike("stream.*join"))
        .select(col("doc_id"), col("source"))
    }),

    // P3+A1 (the "complex app"): equality filter then count-by-key. Batch
    // groupBy/count == final state of the reference's running dict
    // (tests/sample2_op2.py:16).
    "rs02_complex_app" -> ((s, d) => {
      Tables(s, d, "documents")
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // A2: count of incoming keys (tests/mp4_demo2.py:6-12), keyed on the
    // record key — here the event user.
    "rs03_count_by_key" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "rs01_simple_app" ->
      """SELECT doc_id, source FROM documents
        |WHERE regexp_matches(text, 'stream.*join')""".stripMargin,
    "rs02_complex_app" ->
      """SELECT source, COUNT(*) AS n_docs FROM documents
        |WHERE lang = 'en' GROUP BY source""".stripMargin,
    "rs03_count_by_key" ->
      "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id"
  )
}
