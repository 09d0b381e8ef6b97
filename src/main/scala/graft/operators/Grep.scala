package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** LogQuerier parity: distributed pattern search with per-machine and total
  * counts.
  *
  * The reference scatters a grep to every host and gathers matching lines
  * (reference src/LogQuerier/client.py:113-152, server exec
  * src/LogQuerier/server.py:30-36); `-c` mode sums per-host counts into a
  * cluster total under a lock (client.py:103-111,151-152). Here a single
  * declarative plan does both: filter + groupBy(file) + rollup total. At
  * 100 TB the regex runs data-local inside the scan (codegen'd `rlike`),
  * and only tiny per-group counts cross the network — same locality story
  * as the reference's server-side grep, minus the manual fan-out.
  *
  * The `source` column plays the role of the per-machine log file name
  * (machine.<i>.log); over real log directories the same pipeline is
  * `spark.read.text(glob).withColumn("file", input_file_name())` — exposed
  * via [[grepLogs]].
  */
object Grep {

  /** `dgrep <pattern>` over a directory of text logs (the literal
    * LogQuerier surface, SURVEY.md §3.2), with the grep flags the
    * reference's client passes through verbatim to the remote grep
    * (reference src/LogQuerier/client.py:164-199 forwards ALL argv):
    *
    *  - `ignoreCase` (-i): case-insensitive match,
    *  - `invert` (-v): emit NON-matching lines,
    *  - `fixed` (-F): pattern is a literal string, not a regex,
    *  - `-E` is accepted upstream as a no-op — the match engine here is
    *    Java regex, which is ERE-shaped already.
    *
    * Dialect delta (documented per SURVEY §7.4(6)): the reference executes
    * GNU grep, so un-flagged patterns get BRE semantics (`+ ? | ( )` are
    * LITERAL unless backslashed) while this engine always applies Java
    * regex (ERE-shaped) semantics. Patterns using only the common subset
    * (literals, `.` `*` `[...]` `^` `$`) behave identically; use `-F` for
    * exact-string behavior of metacharacter-bearing patterns.
    */
  def grepLogs(spark: SparkSession, glob: String, pattern: String,
      ignoreCase: Boolean = false, invert: Boolean = false,
      fixed: Boolean = false): DataFrame = {
    val re = if (fixed) java.util.regex.Pattern.quote(pattern) else pattern
    val matched = col("value").rlike(if (ignoreCase) s"(?i)$re" else re)
    spark.read.textFile(glob).toDF("value")
      .withColumn("file", input_file_name())
      .filter(if (invert) !matched else matched)
  }

  /** `dgrep -c`: per-file counts plus a TOTAL row, like client.py:151-152.
    * The total aggregate coalesces to 0 so a query with zero matches
    * still reports `TOTAL: 0`, as the reference does. `perFileCap` is
    * grep's `-m` composed with `-c`: each file's count saturates at the
    * cap and TOTAL is the sum of the capped counts (what the reference
    * client's per-machine sum would report under -m). */
  def grepCount(lines: DataFrame,
      perFileCap: Option[Int] = None): DataFrame = {
    val per = lines.groupBy(col("file")).count()
    val capped = perFileCap.fold(per)(m =>
      per.withColumn("count", least(col("count"), lit(m.toLong))))
    capped.unionByName(
      capped.agg(coalesce(sum(col("count")), lit(0L)).as("count"))
        .select(lit("TOTAL").as("file"), col("count")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Matching-lines mode over the documents corpus, source = "machine".
    "gr01_grep_lines" -> ((s, d) => {
      Tables(s, d, "documents")
        .filter(col("text").rlike("vector (scan|merge)"))
        .select(col("source"), col("doc_id"))
    }),

    // Count mode: per-source counts + TOTAL (client.py:103-111 analogue).
    "gr02_grep_count" -> ((s, d) => {
      Tables(s, d, "documents")
        .filter(col("text").rlike("vector (scan|merge)"))
        .rollup(col("source"))
        .agg(count(lit(1)).as("n_matches"))
        .withColumn("source", coalesce(col("source"), lit("TOTAL")))
    }),

    // Regex with a character class + quantifier over the events JSON props
    // (the reference's regex-pattern latency workload,
    // reports/Logger Report.pdf p.1 `/product/\d+`).
    "gr03_grep_regex" -> ((s, d) => {
      Tables(s, d, "events")
        .filter(col("props").rlike("\"k\": 1[0-9][}]"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_matches"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "gr01_grep_lines" ->
      """SELECT source, doc_id FROM documents
        |WHERE regexp_matches(text, 'vector (scan|merge)')""".stripMargin,
    "gr02_grep_count" ->
      """SELECT COALESCE(source, 'TOTAL') AS source, COUNT(*) AS n_matches
        |FROM documents WHERE regexp_matches(text, 'vector (scan|merge)')
        |GROUP BY ROLLUP (source)""".stripMargin,
    "gr03_grep_regex" ->
      """SELECT event_type, COUNT(*) AS n_matches FROM events
        |WHERE regexp_matches(props, '"k": 1[0-9][}]')
        |GROUP BY event_type""".stripMargin
  )
}
