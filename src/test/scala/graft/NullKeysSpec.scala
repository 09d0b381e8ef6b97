package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Null-key hardening as a CLASS, not a site (VERDICT r13 next-#2).
  *
  * The driver fixtures carry no NULL group keys, so any kernel that
  * regroups with `=` instead of `<=>`, sorts a collected key list, or
  * lets a window's NULL partition fabricate a mega-entity would pass
  * every gate until real data hit it. This spec generates the
  * null-bearing fixture variant (ScaleData `nulls`: ~2% deterministic
  * NULLs in every group/join key column) and pins the engine-side
  * invariants of the queries the r14 sweep actually broke — the full
  * 129-query DuckDB gate on this fixture class is the
  * CORRECTNESS_nulls.json sidecar (129/129 after the fixes).
  *
  * Fixed in r14 (each a distinct NULL-semantics class):
  *  - tx09: NULL lang crashed a driver-side sortBy (NPE) — unlabeled
  *    docs now train no profile but still get scored;
  *  - ev08/ev13: the per-user window's NULL partition fabricated one
  *    mega-user from all unattributable events — excluded, both sides;
  *  - ev18: the oracle's USING self-join dropped the NULL from_type
  *    group the engine's window kept — oracle now uses the window form;
  *  - ev19: NULL user_id poisoned the Morton key (engine/oracle NULL
  *    sort order differs) — coalesced to sentinel -1 (&65535 = top of
  *    the user dimension, the "nulls file") on both sides.
  */
class NullKeysSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession()

  /** The sf0.01 nulls fixture, generated once into target/ and reused
    * across runs (deterministic id-hash — identical bytes every time).
    * sf0.01, not 0.001: at 50 docs the 2% injection rate leaves some
    * key columns (documents.source) with zero NULLs by chance, and a
    * nulls fixture with no nulls tests nothing. */
  lazy val nf: String = {
    val dir = new java.io.File("target/nulls_sf0.01_fixture")
    val stamp = new java.io.File(dir, "_DONE")
    if (!stamp.exists()) {
      ScaleData.generate(spark, 0.01, dir.getPath, nullKeys = true)
      stamp.createNewFile()
    }
    dir.getPath
  }

  test("nulls fixture: every injected key column actually carries NULLs") {
    val checks = Seq(
      ("events", "user_id"), ("events", "event_type"),
      ("lineitem", "l_returnflag"), ("orders", "o_orderpriority"),
      ("customer", "c_mktsegment"), ("documents", "lang"),
      ("documents", "source"))
    checks.foreach { case (t, c) =>
      val n = graft.core.Tables(spark, nf, t)
        .filter(col(c).isNull).count()
      assert(n > 0, s"$t.$c: fixture carries no NULLs — the hardening " +
        "sweep is testing nothing")
    }
  }

  test("the whole 129-query surface BUILDS AND EXECUTES on NULL group " +
      "keys — no NPE, no analysis error (the tx09 crash class)") {
    // row counts are the DuckDB sidecar's job; this pins "does not
    // throw" for every entry, which is what a null key breaks first
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        fn(spark, nf).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          fail(s"$name threw on the nulls fixture: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
  }

  test("ev08/ev13: NULL user_id is excluded — no fabricated mega-user") {
    val funnel = SparkEntry.queries("ev08_funnel")(spark, nf).head()
    spark.catalog.clearCache()
    // recompute stage 1 independently: signups among ATTRIBUTED users
    val expect = graft.core.Tables(spark, nf, "events")
      .filter(col("user_id").isNotNull && col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    spark.catalog.clearCache()
    assert(funnel.getLong(funnel.fieldIndex("n_signup")) == expect)
    val lag = SparkEntry.queries("ev13_conversion_lag")(spark, nf)
      .collect()
    spark.catalog.clearCache()
    assert(lag.nonEmpty)
    assert(lag.forall(r => !r.isNullAt(0)),
      "ev13 emitted a NULL-user conversion row")
  }

  test("ev18: the NULL from_type group SURVIVES (GROUP BY semantics — " +
      "a NULL-typed event still transitions)") {
    val rows = SparkEntry.queries("ev18_event_transitions")(spark, nf)
      .collect()
    spark.catalog.clearCache()
    assert(rows.exists(_.isNullAt(0)),
      "no NULL from_type group — the census dropped NULL-typed events")
    // p_micro must still be well-formed within the NULL group
    rows.filter(_.isNullAt(0)).foreach { r =>
      val p = r.getLong(r.fieldIndex("p_micro"))
      assert(p >= 0 && p <= 1000000)
    }
  }

  test("ev19: NULL user_id lands in the sentinel region (u = 65535), " +
      "never a NULL Morton key") {
    val rows = SparkEntry.queries("ev19_zorder_layout")(spark, nf)
      .collect()
    spark.catalog.clearCache()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("user_span")),
        "NULL span: a NULL u leaked into the layout census")
    }
    // the top bucket's user extent reaches the sentinel
    assert(rows.map(_.getLong(3)).max <= 65535)
  }

  test("tx09: NULL lang neither crashes nor trains a profile; unlabeled " +
      "docs are still scored") {
    val rows = SparkEntry.queries("tx09_charngram_langid")(spark, nf)
      .collect()
    spark.catalog.clearCache()
    // the confusion matrix has NULL-lang rows (they were scored) ...
    assert(rows.exists(_.isNullAt(0)), "unlabeled docs vanished")
    // ... and no prediction is NULL (profiles come from labeled docs
    // only, so every winner is a real language or 'unk')
    assert(rows.forall(!_.isNullAt(1)))
  }
}
