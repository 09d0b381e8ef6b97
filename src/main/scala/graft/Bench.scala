package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE compact JSON line for the driver plus a full
  * per-query detail file (`bench_full.json`).
  *
  * The headline line is deliberately small (<~1 kB): the driver captures only
  * a bounded tail of stdout, and a line carrying every query at full double
  * precision overflows it (round 1's line was ~2.2 kB and failed to parse).
  * The complete per-query map lives in bench_full.json and on an earlier
  * stdout line.
  */
object Bench {

  /** Representative queries inlined into the headline JSON (one or two per
    * operator family); the full map is in bench_full.json. */
  private val Headline = Seq(
    "q01_pricing_summary", "q03_topk_orders", "q05_broadcast_join",
    "q13_cube", "q19_scalar_subquery", "q23_percentiles",
    "dd01_exact_dedup", "dd03_minhash_lsh", "dd06_dedup_clusters",
    "sim01_knn_bruteforce", "tx08_tfidf_pairs", "ev01_sessionize",
    "gr01_grep_lines", "rs01_simple_app")

  /** Queries that consume a lazily-built persisted IndexStore artifact
    * (pair table / IVF cells / PQ codebook+codes). Their first timed
    * pass pays the one-time index BUILD — real user-facing work that a
    * plain min-of-2 would silently swallow (dd09's sf2 passes were
    * [41.3 s, 0.53 s] and the headline said 0.53) — so the bench wipes
    * the sfDir's index store up front (pass 1 = deterministic
    * build+query, pass 2 = steady state) and reports both: the headline
    * `queries` map carries the steady number, `index_build` carries
    * {first_pass_s, steady_s, build_s}. Within a pass the FIRST query
    * to touch an artifact builds it (alphabetical order: dd09 builds the
    * pair table that dd10/dd14 reuse; sim03_ivf_knn the IVF index that
    * sim03_probe reuses; sim05_pq_knn the PQ codebook+codes that
    * sim05_probe reuses). */
  private val IndexBacked = Seq(
    "dd09_clusters_from_pairs", "dd10_dedup_corpus_from_pairs",
    "dd14_cluster_canonical", "dd17_incremental_probe",
    "sim03_ivf_knn", "sim03_probe", "sim05_pq_knn", "sim05_probe",
    "gx01_pagerank", "gx02_triangles")

  private def jnum(v: Double): String = f"$v%.3f"

  /** JSON string escape for free-text fields interpolated into the
    * sidecars (r14 advisor: a quote/backslash in SPARK_GRAFT_BENCH_SKIP's
    * reason produced an unparseable BENCH file). */
  private def jesc(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case c if c < ' '  => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }

  /** The measurement window, stamped into every sidecar (VERDICT r14
    * "what's wrong" #1: two rounds of officials were collected in the
    * end-of-round contended window and nothing in the artifact said so —
    * with the window stamped, a consumer can line a run up against the
    * host's campaign schedule instead of guessing). */
  private def windowJson(startMs: Long): String = {
    val endMs = System.currentTimeMillis()
    val iso = (ms: Long) => java.time.Instant.ofEpochMilli(ms)
      .toString.takeWhile(_ != '.') + "Z"
    s""""run_window":"${iso(startMs)}..${iso(endMs)}""""
  }

  /** Run the streaming section in a fresh child JVM (same classpath and
    * JVM flags as this one, SPARK_GRAFT_STREAMING=only) and read its
    * bench_streaming.json. Launched AFTER the batch passes, so the
    * child's JVM holds nothing but the streaming micro-bench — the
    * sidecars' quiet protocol, driven by the bench itself. Returns
    * empty (distinct from a measured zero) if the child fails; its
    * stdout/stderr land in bench_streaming_child.log. */
  private def streamingInChild(): Seq[(String, Double)] = {
    import scala.jdk.CollectionConverters._
    try {
      val jvm = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getPath
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cmd = (Seq(jvm) ++ jvmArgs ++ Seq("-cp",
        System.getProperty("java.class.path"), "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_STREAMING", "only")
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File("bench_streaming_child.log"))
      val p = pb.start()
      val code = p.waitFor()
      if (code != 0) {
        System.err.println(s"[bench] streaming child exited $code " +
          "(see bench_streaming_child.log)")
        return Seq.empty
      }
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_streaming.json")), "UTF-8")
      // digits allowed in key names (e.g. a future win10s row) but not
      // leading — a truncated capture would silently corrupt the sidecar
      """"([a-z][a-z0-9_]*)":([0-9.]+)""".r.findAllMatchIn(json)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._1 != "metric").toSeq
    } catch { case e: Exception =>
      System.err.println(s"[bench] streaming child failed: ${e.getMessage}")
      Seq.empty
    }
  }

  /** Fixture fingerprint: the physical quadruple (bytes/rows/rowGroups/
    * files) per table straight from [[graft.core.Tables.layout]]'s footer
    * read, plus an md5 of the documents table's first part file. Stamped
    * into every bench sidecar so cross-round per-query deltas are only
    * ever read against IDENTICAL fixture bytes — the r9/r10 "same
    * generator, 2x different files" drift (PLANS.md §3; an r11
    * regeneration A/B with the r9-era 128 MB block size reproduced the
    * SMALL files, so block size is ruled out and the r9-era inflation
    * remains unreproducible from HEAD) becomes detectable at a glance
    * instead of after a week of confounded numbers. */
  private def fixtureJson(spark: SparkSession, sfDir: String): String = {
    val dir = new java.io.File(sfDir)
    val tables = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val perTable = tables.map { t =>
      val l = graft.core.Tables.layout(spark, t.getPath)
      s""""${t.getName.stripSuffix(".parquet")}":[${l.bytes},${l.rows},${l.rowGroups},${l.files}]"""
    }.mkString("{", ",", "}")
    val md5 = tables.find(_.getName == "documents.parquet").map { t =>
      val part = if (t.isDirectory)
        t.listFiles().filter(f => !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).sortBy(_.getName).headOption
          .getOrElse(t)
        else t
      val d = java.security.MessageDigest.getInstance("MD5")
      val in = new java.io.FileInputStream(part)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n > 0) { d.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      d.digest().map("%02x".format(_)).mkString
    }.getOrElse("absent")
    s""""fixture":{"tables":$perTable,"documents_md5":"$md5","layout":"[bytes,rows,row_groups,files]"}"""
  }

  def main(args: Array[String]): Unit = {
    val runStartMs = System.currentTimeMillis()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER / SPARK_GRAFT_JARS: see graft.core.Topology —
    // the multi-executor validation path (local-cluster[W,C,mem])
    val spark = graft.core.Topology(graft.core.EngineConf(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // see Verify: keeps single-file table scans parallel at sf>=1.0,
      // with the open-cost floor below the fixtures' 2 MB row groups so
      // split planning can use them and mid-size tables scan wide
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "512k")
      // Multi-hour single-context campaigns (sf8): shuffle FILES are
      // deleted by ContextCleaner only after their dependencies are
      // GC'd, and the default periodicGC interval is 30 MIN — on a big
      // heap that barely collects, hours of dead shuffle files pile up
      // on local disk (r14: the sf8 pass filled the host's ~94 GB
      // usable). 2 min caps the dead-file window; per-query System.gc()
      // (below) handles the common case, this is the backstop.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Streaming section mode: "child" (default — batch in this process,
    // then the streaming micro-bench in a FRESH child JVM, sequentially),
    // "inline" (legacy r<=10 protocol, same process), "skip", or "only".
    // The streaming rows are scale-INVARIANT (fixed 10k-row fixtures),
    // so any in-process measurement inherits the batch surface's heap
    // debris and GC debt — r10's driver bench read streaming ~2x below
    // the quiet sidecar protocol for exactly this reason (and r7's sf2
    // rows depressed ~2.6x under a concurrent batch gate). The child
    // runs AFTER the batch passes complete, in a JVM whose only work is
    // the streaming section — the quiet protocol, driven BY the bench.
    val streamMode = sys.env.getOrElse("SPARK_GRAFT_STREAMING", "child")

    if (streamMode == "only") {
      val streaming = streamingMedianOf3(spark)
      val streamJson = streaming.map { case (k, v) => s"\"$k\":${jnum(v)}" }
        .mkString("""{"metric":"streaming","streaming_rec_s":{""", ",",
          s"""},"streaming_protocol":"child-jvm;median-of-3;host-swing see BENCH_streaming_ab.json",${windowJson(runStartMs)},"sf":"$sfDir"}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_streaming.json"),
        (streamJson + "\n").getBytes("UTF-8"))
      println(streamJson)
      spark.stop()
      return
    }

    // dd05 gate: the exact O(N^2) all-pairs baseline exists as dd07's
    // recall anchor at spec'd scales (<= sf1), not as a scale path — at
    // sf2 it was 13% of the whole bench total and growing ~N^2 (91.7 s,
    // 3.1x for 2x), drowning the scale-path trend the sidecars exist to
    // show. Above the sf1 corpus size it is excluded from the timed
    // passes and the JSON says so; its anchor role (bit-exact vs the
    // numpy checker at sf1) is unchanged.
    val nVec = try graft.core.Tables(spark, sfDir, "embeddings").count()
      catch { case _: Throwable => 0L }
    val gateDd05 = nVec > 60000
    // sim08 is the kNN-graph twin of dd05's role: the exact O(N^2)
    // anchor the scale path (sim09) is recall-checked against — same
    // gate, same rationale
    val ExactPairAnchors = Set("dd05_embedding_neardup", "sim08_knn_graph")
    // Optional subset run (comma-separated names): the targeted-sidecar
    // dev loop — e.g. the sf4 pair-kernel trend point only times the five
    // pair kernels instead of paying for the full query surface.
    // an empty-but-set variable means "no subset", not "match nothing"
    // (a shell `VAR=''` passthrough silently benched zero queries)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // Campaign-level exclusions, STAMPED in the JSON (a silent cap reads
    // as "covered everything"): SPARK_GRAFT_BENCH_SKIP=q1,q2;reason.
    // Exists for the closed-fixture sf8 point, where gx01/gx02's exact
    // tau=0.5 pair mine is quadratic BY FIXTURE CONSTRUCTION (saturated
    // 27k-shingle vocab -> per-key df grows with N; >37 GB of shuffle
    // before dying at sf8) — the same class as the dd05/sim08 gate; the
    // gx family's linearity evidence lives on the open-vocabulary
    // fixture (BENCH_open_sf{1..8}_gx.json, alpha ~= 0.05).
    // PairBudget degradation stamps (degrade_<query>.json, written by
    // the kernels when a pair-volume budget lowers a df cap): clear
    // stale ones up front, collect fresh ones into the sidecar after
    // the passes — a budget-bounded run must say so in the artifact.
    Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("degrade_.*\\.json")).foreach(_.delete())
    val (skipSet, skipReason) = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map { v =>
        val parts = v.split(';')
        (parts(0).split(',').map(_.trim).filter(_.nonEmpty).toSet,
          if (parts.length > 1) parts(1) else "unspecified")
      }.getOrElse((Set.empty[String], ""))
    val benchQueries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .filterNot { case (n, _) => gateDd05 && ExactPairAnchors(n) }
      .filterNot { case (n, _) => skipSet(n) }

    // Warm every query's codegen/scan path at the tiniest sf so timed
    // numbers measure the query, not one-time JVM/compile startup
    // (otherwise whichever query runs first absorbs ~3-8 s of warmup).
    // The warmup dir is sfDir's sf0.001 sibling when present so a custom
    // SPARK_GRAFT_SF_DIR keeps warmup and measurement on the same dataset.
    val warmSib = new java.io.File(
      new java.io.File(sfDir).getParentFile, "sf0.001")
    val warmDir = if (warmSib.isDirectory) warmSib.getPath else sfDir
    benchQueries.foreach { case (_, fn) =>
      try fn(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally spark.catalog.clearCache()
    }

    // Deterministic index-build accounting (see IndexBacked): wipe the
    // measured dataset's persisted index store so pass 1 always pays the
    // build and pass 2 is always steady-state — without this, whether a
    // stale index from an earlier run exists silently decides what the
    // first pass measures. AFTER the warmup loop: when the sf0.001
    // sibling is absent warmup falls back to sfDir itself and would
    // rebuild every index off the clock, silently voiding the invariant
    // (with a distinct warmDir the ordering is a no-op). Deleted through
    // the Hadoop FS API — IndexStore supports SPARK_GRAFT_INDEX_DIR on
    // HDFS/S3, where a java.io.File delete silently no-ops and a stale
    // remote index would decide what pass 1 measures.
    val idxRoot = new org.apache.hadoop.fs.Path(
      graft.core.IndexStore.root(sfDir))
    idxRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(idxRoot, true)

    // Per-query watermarks (pass 2 only — the timed min's usual source):
    // [gc_ms during the query, storage bytes STILL held after
    // clearCache+GC, heap bytes after]. The r10 verdict's ask: when a
    // full-surface run reads above a dedicated run, these say whether
    // the gap is GC debt / storage residue (harness contention) or the
    // query itself — attribution instead of argument.
    val watermarks = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long, Long)]
    def timedPass(record: Boolean = false): Seq[(String, Double)] =
      benchQueries.map { case (name, fn) =>
        val gc0 = org.apache.spark.sql.graftx.MemProbe.gcMillis
        val t0 = System.nanoTime()
        // noop sink materializes every output column (a count() would let
        // Catalyst prune the projections being measured).
        // failed queries report -1, never a bogus near-zero "great" time;
        // elapsed is captured before clearCache so cache teardown is not
        // billed to the query
        var elapsed = -1.0
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          elapsed = (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        finally {
          spark.catalog.clearCache() // drop per-query persisted indexes
          // Cross-query pressure: clearCache drops DATASET caches, but a
          // heavy query also leaves broadcast blocks and heap debris
          // whose cleanup rides ContextCleaner's reference queue — which
          // only drains after a driver GC. Across 100+ queries that lag
          // accumulates storage-memory pressure that evicts the NEXT
          // heavy query's persists (r9 sf4: tx14 grew 4.07x inside the
          // full-surface run vs 1.83x dedicated). Force the GC here, off
          // the clock (elapsed is already captured), and only after
          // queries heavy enough to have left debris — a full GC after
          // every sub-second query would cost more wall than it frees.
          if (elapsed < 0 || elapsed >= 2.0) System.gc()
          if (record) {
            import org.apache.spark.sql.graftx.MemProbe
            watermarks(name) = (MemProbe.gcMillis - gc0,
              MemProbe.storageUsed, MemProbe.heapUsed)
          }
        }
        name -> elapsed
      }
    // Two timed passes, per-query min. A transient host stall (GC storm,
    // co-scheduled work) hits a contiguous time window; with two
    // temporally separated measurements the minimum discards the stalled
    // one instead of recording it as a plan regression. (Round 5's driver
    // bench recorded q13_cube at 32 s under co-scheduled load vs its
    // steady-state 0.7 s — exactly the artifact this protocol removes.)
    // Both raw pass times are emitted alongside the min (and the headline
    // carries a protocol tag) so consumers can tell min-of-2 results from
    // the single-pass protocol of rounds <= 5 — the metric definitions
    // differ and cross-round comparisons must not conflate them.
    // SPARK_GRAFT_BENCH_PASSES=1: single timed pass (A/B-indicator
    // protocol — compare pass1-vs-pass1 across arms; the official
    // sidecars stay min2). Any other value = the min2 default.
    val singlePass = sys.env.get("SPARK_GRAFT_BENCH_PASSES").contains("1")
    val pass1 = timedPass(record = singlePass)
    val pass2 = if (singlePass) pass1 else timedPass(record = true)
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) =>
      name -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }

    // Streaming throughput in BASELINE.md's own units (output rec/s on the
    // reference's two canonical 10k-row apps; reference: ~84 rec/s simple).
    val streaming = streamMode match {
      case "skip"   => Seq.empty
      case "inline" => streamingMedianOf3(spark)
      case _        => streamingInChild()
    }

    val failures = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullQs = results.map { case (k, v) => s"\"$k\":${jnum(v)}" }
      .mkString("{", ",", "}")
    // Always emit the key — an empty {} marks "streaming section did not
    // run" (e.g. missing fixture checkout) as distinct from "removed".
    // protocol head tracks the MODE actually used (r14 advisor: the
    // stamp hardcoded "child-jvm" even under SPARK_GRAFT_STREAMING=inline,
    // where the section runs in the loaded batch JVM)
    val streamProtoHead =
      if (streamMode == "inline") "inline-jvm" else "child-jvm"
    val streamJson = streaming.map { case (k, v) => s"\"$k\":${jnum(v)}" }
      .mkString(""","streaming_rec_s":{""", ",", "}") +
      (if (streaming.nonEmpty)
        s""","streaming_protocol":"$streamProtoHead;median-of-3;host-swing see BENCH_streaming_ab.json""""
       else "")
    val passesJson = pass1.zip(pass2).map { case ((k, a), (_, b)) =>
      s""""$k":[${jnum(a)},${jnum(b)}]""" }.mkString("{", ",", "}")
    // Index build cost, split out per IndexBacked query: build_s is the
    // first-touch premium over steady state (clamped at 0 — noise can
    // make a warm pass slower than a cold one on non-building reusers).
    val indexJson = pass1.zip(pass2)
      .filter { case ((k, _), _) => IndexBacked.contains(k) }
      .map { case ((k, a), (_, b)) =>
        val build = if (a >= 0 && b >= 0) math.max(0.0, a - b) else -1.0
        s""""$k":{"first_pass_s":${jnum(a)},"steady_s":${jnum(b)},"build_s":${jnum(build)}}"""
      }.mkString(""","index_build":{""", ",", "}")
    // fold any degradation stamps written during the passes into the
    // sidecar (each file is one JSON object emitted by PairBudget)
    val degradeJson = {
      val files = Option(new java.io.File(".").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.matches("degrade_.*\\.json")).sortBy(_.getName)
      if (files.isEmpty) "" else files.map { f =>
        val obj = new String(java.nio.file.Files.readAllBytes(f.toPath),
          "UTF-8").trim
        s""""${f.getName.stripPrefix("degrade_").stripSuffix(".json")}":$obj"""
      }.mkString(""","degraded":{""", ",", "}")
    }
    val gateJson = degradeJson + (if (gateDd05)
      s""","dd05_gated":"excluded ${ExactPairAnchors.toSeq.sorted.mkString("+")}: O(N^2) recall anchors, corpus ${nVec} vectors > 60k sf1 bound (PLANS.md)""""
      else "") +
      (if (skipSet.nonEmpty)
        s""","skipped":"${skipSet.toSeq.sorted.mkString("+")}: ${jesc(skipReason)}""""
       else "")
    val fixJson = try fixtureJson(spark, sfDir)
      catch { case e: Exception => s""""fixture":{"error":"${e.getClass.getSimpleName}"}""" }
    val wmJson = watermarks.map { case (k, (gc, st, hp)) =>
      s""""$k":[$gc,$st,$hp]""" }.mkString(
      """"watermarks_pass2":{""", ",",
      """},"watermarks_layout":"[gc_ms,storage_bytes_after,heap_bytes_after]"""")
    val proto = if (singlePass) "single-pass" else "min2"
    val winJson = windowJson(runStartMs)
    val fullJson =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","protocol":"$proto","failures":$failures,"n_queries":${results.size},"queries":$fullQs,"passes":$passesJson$indexJson$streamJson$gateJson,$fixJson,$wmJson,$winJson,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (fullJson + "\n").getBytes("UTF-8"))
    println(s"BENCH_DETAIL $fullJson")

    val headQs = results.filter(r => Headline.contains(r._1))
      .map { case (k, v) => s"\"$k\":${jnum(v)}" }.mkString("{", ",", "}")
    // compact build/steady split for the headline (full detail incl.
    // first_pass_s is in bench_full.json); short keys keep the line
    // within the driver's bounded stdout tail
    val headIdx = pass1.zip(pass2)
      .filter { case ((k, _), _) => IndexBacked.contains(k) }
      .map { case ((k, a), (_, b)) =>
        val build = if (a >= 0 && b >= 0) math.max(0.0, a - b) else -1.0
        s""""$k":{"build_s":${jnum(build)},"steady_s":${jnum(b)}}"""
      }.mkString(""","index_build":{""", ",", "}")
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","protocol":"$proto","failures":$failures,"n_queries":${results.size},"queries":$headQs$headIdx$streamJson$gateJson,$fixJson,$winJson,"detail":"bench_full.json","sf":"$sfDir"}""")
    spark.stop()
  }

  /** Streaming rates, best (max) of two temporally separated passes — the
    * rate-metric mirror of the batch min-of-2: a host stall depresses a
    * throughput measurement, so the max discards the stalled pass instead
    * of reporting it as a regression on scale-invariant fixtures. */
  /** MEDIAN-of-3 (r14, VERDICT r13 "what's wrong" #1): the r13 artifact
    * carried max-of-2 rates measured as the tail of the round's heaviest
    * campaign — 2,925/720 rec/s where the same-HEAD quiet run read
    * 3,380/1,126, with BENCH_streaming_ab.json documenting a 1.46x
    * same-code host swing. Max-of-2 under sustained contention still
    * reports a contended number; the median of three spaced passes
    * rejects one bad pass outright and the protocol is stamped in the
    * JSON so consumers can tell the eras apart. (The child JVM already
    * isolates from the batch surface's heap; this addresses HOST-level
    * co-running load.) */
  private def streamingMedianOf3(spark: SparkSession): Seq[(String, Double)] =
    try {
      val passes = (1 to 3).map { i =>
        if (i > 1) Thread.sleep(2000) // let fs/page-cache effects settle
        streamingRates(spark)
      }
      passes.head.indices.map { j =>
        val k = passes.head(j)._1
        k -> passes.map(_(j)._2).sorted.apply(1)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] streaming bench failed: ${e.getMessage}")
      Seq.empty }

  /** Measure BASELINE.md's four streaming rows end-to-end (10k-row CSV →
    * streaming job → text sink), in output rec/s, the reference's metric
    * (reports/Streaming.pdf p.2-3):
    *
    *  - Traffic Signs simple/complex run on the reference's OWN
    *    `TrafficSigns_10000` fixture with the published workloads (pattern
    *    `Unpunched Telespar` → project(OBJECTID, Sign_Type); filter
    *    Sign_Type=Stop → count by Category), so the comparison shares the
    *    exact input bytes with the published charts (ref ~84 / ~0.101).
    *  - Customer Churn simple/complex run on a synthesized 10k CSV in the
    *    Kaggle churn schema (the fixture is not in the repo) with the
    *    published workloads: pattern France → project(CustomerId,
    *    Surname); filter Gender=Female → count by IsActiveMember
    *    (ref ~330 / ~0.128).
    */
  private def streamingRates(spark: SparkSession): Seq[(String, Double)] = {
    import graft.streaming.{RainStormApps, RainStormJob, RainStormOp}
    import java.nio.file.Files
    val root = Files.createTempDirectory("bench-stream").toFile

    def countOut(out: java.io.File): Long = {
      def all(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(all) else Seq(f)
      all(out).filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
        .map { f =>
          val s = scala.io.Source.fromFile(f)
          try s.getLines().size.toLong finally s.close()
        }.sum
    }

    def run(name: String, write: java.io.File => Unit,
        ops: Seq[RainStormOp], stateful: Boolean): (String, Double) = {
      val in = new java.io.File(root, s"in-$name"); in.mkdirs()
      write(in)
      val out = new java.io.File(root, s"out-$name")
      val t0 = System.nanoTime()
      RainStormJob.start(spark, in.getPath, ops, out.getPath,
        new java.io.File(root, s"ckpt-$name").getPath, stateful)
        .awaitTermination()
      name -> countOut(out) / ((System.nanoTime() - t0) / 1e9)
    }

    // Warm the streaming machinery (class loading, codegen) off the clock.
    run("warmup", in => Files.write(new java.io.File(in, "w.csv").toPath,
        "0,sign,Unpunched Telespar,cat0".getBytes("UTF-8")),
      RainStormApps.simpleApp("Unpunched Telespar", 0, 3), stateful = false)

    // Fixture root is overridable so a host without the reference checkout
    // can still run this section (the default matches this container).
    val fixtureRoot = sys.env.getOrElse("SPARK_GRAFT_FIXTURES",
      "/root/reference/test_files")
    def copyFixture(in: java.io.File): Unit =
      Files.copy(java.nio.file.Paths.get(fixtureRoot, "TrafficSigns_10000"),
        new java.io.File(in, "signs.csv").toPath)

    // Kaggle churn schema fixture, shared with ChurnFixtureSpec's goldens.
    def writeChurn(in: java.io.File): Unit =
      Files.write(new java.io.File(in, "churn.csv").toPath,
        RainStormApps.syntheticChurnLines(10000)
          .mkString("\n").getBytes("UTF-8"))

    Seq(
      run("simple_app", copyFixture,
        RainStormApps.simpleApp("Unpunched Telespar", 2, 3),
        stateful = false),
      run("complex_app", copyFixture,
        RainStormApps.complexApp(3, "Stop", 8), stateful = true),
      run("churn_simple", writeChurn,
        RainStormApps.simpleApp("France", 1, 2), stateful = false),
      run("churn_complex", writeChurn,
        RainStormApps.complexApp(5, "Female", 11), stateful = true))
  }
}
