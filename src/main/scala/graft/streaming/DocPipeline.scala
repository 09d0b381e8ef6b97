package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming training-data ingest: the batch text/dedup operators
  * (graft.operators.{TextAnalysis, Dedup}) recomposed over an unbounded
  * document stream — quality gate, then exact content dedup within the
  * watermark horizon.
  *
  * This is the shape a 100 TB/day corpus intake actually runs: cheap
  * per-row scoring in the scan, then a state-store dedup keyed on a
  * 16-byte fingerprint (never the body), with the watermark bounding
  * state — the same bounded-state discipline the reference's ever-growing
  * dedup dict lacks (reference src/Streaming/worker.py:446-453,
  * SURVEY.md §7.4(4)).
  */
object DocPipeline {

  /** Per-row quality gate: token count and type-token ratio thresholds
    * (the streaming twin of tx02_quality_score's verdict column). */
  def qualityFilter(docs: DataFrame, minTokens: Int = 40,
      minTtr: Double = 0.25): DataFrame =
    docs
      .withColumn("toks",
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .withColumn("n_tok", expr("size(toks)"))
      .filter(col("n_tok") >= minTokens &&
        expr("size(array_distinct(toks))").cast("double") / col("n_tok")
          >= minTtr)
      .drop("toks", "n_tok")

  /** Exact content dedup within the watermark horizon, keyed on the md5
    * of whitespace-normalized text — only fingerprints enter the state
    * store. */
  def dedupByContent(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.core.Fingerprints.content(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Full ingest: gate then dedup. */
  def ingest(docs: DataFrame, minTokens: Int = 40, minTtr: Double = 0.25,
      lateness: String = "10 minutes"): DataFrame =
    dedupByContent(qualityFilter(docs, minTokens, minTtr), lateness)
}
