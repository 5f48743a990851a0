package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline canon on SPARK_GRAFT_SF_DIR and
  * prints one JSON line ({"metric":..,"queries":{..}}). Each query is
  * executed twice and the MIN is reported: the first run pays
  * JIT/codegen + file-listing warmup, and taking the better of the two
  * keeps a one-off GC pause in the shared JVM from masquerading as a
  * query regression (best-of-n, the standard steady-state estimator).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // ---- CALIBRATION ANCHOR (r13) ----
    // Two fixed, engine-independent workloads whose wall time rides in
    // the BENCH JSON as calib_cpu / calib_engine, so cross-round totals
    // compare mechanically instead of needing forensic adjudication of
    // ambient machine noise (r11 needed a policy note, r12 a four-line
    // evidence chain for a uniform 1.38x drift on untouched plans).
    //  - calib_cpu: a single-thread xorshift64* fold — raw
    //    cycles-per-second of one core: no allocation, no Spark, pure
    //    JIT-compiled scalar loop.
    //  - calib_engine: a pinned-size hash aggregate + sort over
    //    spark.range — the whole Spark stack (codegen, exchange, task
    //    scheduling, the shared JVM's GC posture) on a workload whose
    //    plan can never change with this repo's code.
    // The CPU anchor runs twice before and twice after the canon (min
    // of the four — it is allocation-free and stable). The ENGINE
    // anchor runs twice before, once MID-canon and twice after, and
    // reports the MEDIAN of the five timed legs: a min-of-N anchor
    // would measure the session's best case (each leg runs right
    // after a System.gc()), but the queries run under the session's
    // ACCUMULATED pressure — the median across pre/mid/post legs
    // tracks what the canon actually experienced, which is what
    // cross-round normalization needs. Normalized figures divide by
    // calib_engine / CALIB_ENGINE_REF (the engine anchor tracks query
    // cost far better than the scalar loop; calib_cpu separates
    // "machine is slow" from "JVM/GC is unhappy"). REF constants were
    // measured in r13 on an otherwise-idle driver machine; SCALE.md
    // documents the method and the ~±10% ambient jitter band.
    val CalibEngineRef = 2.0
    val CalibCpuRef = 0.67
    def calibCpuOnce(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var acc = 0L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < 300000000L) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        acc += x * 0x2545F4914F6CDD1DL
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (acc == 42L) System.err.println("[bench] calib fold anchor")
      dt
    }
    def calibEngineOnce(): Double = {
      import org.apache.spark.sql.functions._
      System.gc()
      val t0 = System.nanoTime()
      spark.range(0L, 40000000L, 1L, 64)
        .select((col("id") % 1000000L).as("k"), col("id").as("v"))
        .groupBy("k").agg(sum(col("v")).as("s"))
        .orderBy(col("s").desc, col("k")).limit(101).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val engineLegs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def engineLeg(): Double = { val v = calibEngineOnce(); engineLegs += v; v }
    // untimed warmup execution first: the anchor must measure the
    // MACHINE, not this JVM's JIT progress — without it the pre legs
    // run interpreted/C1 and the post legs' warmth depends on how
    // heavy the canon happened to be, which made the min drift ~15%
    // between a 1-query smoke run and the full canon
    calibCpuOnce(); calibEngineOnce()
    val cpuPre = math.min(calibCpuOnce(), calibCpuOnce())
    engineLeg(); engineLeg() // pre-canon engine legs

    // local iteration only (driver sets neither): run a subset of the
    // headline canon, and/or skip the scaling probe
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val noScaling = sys.env.contains("SPARK_GRAFT_BENCH_NO_SCALING")

    val canonNames = SparkEntry.headline
      .filter(n => only.forall(_.contains(n)))
    // the MID-canon engine leg fires halfway through the canon, under
    // exactly the accumulated session pressure the queries see
    val midAt = if (canonNames.size >= 4) canonNames.size / 2 else -1
    val inSession = canonNames.zipWithIndex
      .map { case (name, idx) =>
      if (idx == midAt) engineLeg()
      // drain the PREVIOUS queries' garbage before measuring this one
      // (r11): the table-protocol gates leave multi-hundred-MB setup
      // debris (scratch catalogs, broadcast refs, staged commits)
      // whose collection otherwise bills whichever query runs next —
      // r10 adjudicated three such drifts on untouched code, and the
      // isolated pins consistently measure 2-3x below the in-suite
      // numbers. Draining between queries attributes each query its
      // OWN cost; the policy is uniform across the canon, so totals
      // remain comparable query-to-query (cross-round totals compare
      // against r11+ baselines).
      System.gc()
      val warm = timeOnce(name)    // pays JIT + codegen + file listing
      val steady = timeOnce(name)
      name -> (if (warm < 0 || steady < 0) -1.0 else math.min(warm, steady))
    }
    // session-pressure pin: queries that historically flap under the
    // shared JVM's accumulated GC pressure (text_freq_stats oscillated
    // r4→r6 and the PQ family + text_chunks regressed 4-5× in r7, all
    // with unchanged plans) get one extra measurement at the END of the
    // run with the garbage drained — reported as a SEPARATE "isolated"
    // field, never folded into the official time: every query's
    // headline number is measured under the same policy, so the total
    // and cross-round comparisons stay consistent, while the isolated
    // reruns prove whether a regression is the plan's cost or the
    // session JVM's.
    // r8 additions: q_markov_attribution (1.56×), text_sparse_neardup
    // (1.49×) and weblog_stats_skipping (1.28×) drifted r7→r8 with
    // unchanged plans — the same shared-JVM signature; their isolated
    // numbers adjudicate plan cost vs session pressure per round.
    // r11 additions: dedup_spans (1.75×) and decon_pairs/decon_bloom
    // (1.80×) drifted r9→r10 in the same direction on code untouched
    // since r8 — pin them so adjudication uses the isolated numbers.
    // r15 additions: weblog_pos_delete (+40% raw) and weblog_mor_delete
    // (+21%) drifted r13→r14 on unchanged code with a flat norm_factor,
    // and neither was in this family — so the r14 artifact carried no
    // attribution evidence (VERDICT r14 #1). Their isolated numbers now
    // ride every round.
    // r16 additions: weblog_agg_multi, weblog_metadata_delete and
    // q_min_cost_supplier entered the r15 top-8 with ZERO code change
    // during a 1.77×-contended run (VERDICT r15 #5) — pinned so the
    // next drift on any of them carries isolated attribution evidence.
    val pinned = Seq("text_freq_stats", "sim_pq_topk", "sim_ivfpq_topk",
      "text_chunks", "q_markov_attribution", "text_sparse_neardup",
      "weblog_stats_skipping", "dedup_spans", "decon_pairs", "decon_bloom",
      "weblog_pos_delete", "weblog_mor_delete",
      "weblog_agg_multi", "weblog_metadata_delete", "q_min_cost_supplier")
    val results = inSession
    val isolated = pinned
      .filter(n => inSession.exists(p => p._1 == n && p._2 >= 0))
      .map { n => System.gc(); n -> timeOnce(n) }
    // post-canon calibration legs; the engine anchor is the MEDIAN of
    // every timed leg (see the CALIBRATION ANCHOR note above)
    val cpuPost = math.min(calibCpuOnce(), calibCpuOnce())
    engineLeg(); engineLeg() // post-canon engine legs
    val calibCpu = math.min(cpuPre, cpuPost)
    val calibEngine = {
      val sorted = engineLegs.sorted
      val n = sorted.size
      if (n % 2 == 1) sorted(n / 2) else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
    }
    val normFactor = calibEngine / CalibEngineRef
    // millisecond precision keeps the stdout JSON line compact — r4's
    // full-precision doubles grew the line past the driver's captured
    // tail and cost the round its machine-readable numbers
    def r3(v: Double): Double = math.round(v * 1000d) / 1000d
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Self-scaled dedup probe: the same operators on the sf corpus and on
    // a 10× NEAR-duplicated version of it (each doc replicated 10 times
    // with a distinct tail word, so copies are genuine near-dups that
    // exercise LSH banding + verification, not the exact-set collapse).
    // Both scales read freshly written scratch parquet (cold memo keys,
    // identical I/O path), timed on their FIRST run — JIT/codegen are
    // already warm from the headline loop — so the ratio isolates how the
    // operator's cost grows with corpus size: near-linear (≈10, minus
    // fixed overheads; pair output grows faster by design, being
    // quadratic in per-cluster duplication) is the scale story the
    // banded/bucketed design claims.
    val scaling: Seq[(String, Double)] = if (noScaling) Nil else try {
      import org.apache.spark.sql.functions._
      val scratch = java.nio.file.Files.createTempDirectory("graft_scale").toString
      // capped base so the probe's 10× leg stays a bounded slice of the
      // bench budget at any sf — the point is the RATIO, not the size
      val base = Tables.documents(spark, sfDir).select("doc_id", "text")
        .filter(col("doc_id") < 2000)
      base.write.mode("overwrite").parquet(s"$scratch/docs1x")
      base.crossJoin(spark.range(10).select(col("id").as("rep")))
        .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .write.mode("overwrite").parquet(s"$scratch/docs10x")
      // embedding twin for the binary-ANN leg: the Hamming scan is
      // corpus-size-linear by construction; the probe verifies it
      val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      emb.write.mode("overwrite").parquet(s"$scratch/emb1x")
      emb.crossJoin(spark.range(10).select(col("id").as("rep")))
        .select((col("vec_id") * 10 + col("rep")).as("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(s"$scratch/emb10x")
      def cold(f: () => Any): Double = {
        // drain the headline canon's garbage first: a GC pause landing
        // inside one leg skews the RATIO (r5 observed 13.6× vs ~3.3×
        // for the same code with/without accumulated session pressure)
        System.gc()
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      // median-of-3 for the sub-second span legs (r14): r13's
      // span_removal_1x drifted 0.43 → 1.12 s while the 10× leg
      // improved — a one-off pause inside a sub-second probe flips the
      // ratio. Three GC-prefixed runs, middle value. NOT used for the
      // minhash legs: their core is memoized per plan, so a repeat run
      // would measure the cache, not the operator.
      def coldMedian3(f: () => Any): Double =
        (1 to 3).map(_ => cold(f)).sorted.apply(1)
      def read(p: String) = spark.read.parquet(s"$scratch/$p")
      val out = Seq(
        "minhash_keepers_1x" ->
          cold(() => operators.Dedup.minhashKeepers(read("docs1x")).count()),
        "minhash_keepers_10x" ->
          cold(() => operators.Dedup.minhashKeepers(read("docs10x")).count()),
        "minhash_keepers_capped_1x" ->
          cold(() => operators.Dedup.minhashKeepersCapped(read("docs1x")).count()),
        "minhash_keepers_capped_10x" ->
          cold(() => operators.Dedup.minhashKeepersCapped(read("docs10x")).count()),
        "span_removal_1x" ->
          coldMedian3(() => operators.Dedup.removeDuplicateSpans(read("docs1x")).count()),
        "span_removal_10x" ->
          coldMedian3(() => operators.Dedup.removeDuplicateSpans(read("docs10x")).count()),
        "binary_topk_1x" ->
          cold(() => operators.Similarity.binaryTopK(read("emb1x"),
            read("emb1x").filter(col("vec_id") < 10), k = 5, dim = 64).count()),
        "binary_topk_10x" ->
          // rep-0 copies of the SAME ten originals as the 1x leg
          // (vec_id maps to vec_id*10+rep), so both legs run identical
          // query workloads and the ratio is apples-to-apples
          cold(() => operators.Similarity.binaryTopK(read("emb10x"),
            read("emb10x").filter(col("vec_id") % 10 === 0 && col("vec_id") < 100),
            k = 5, dim = 64).count()))
      // candidate-pair census (r13): the distinct LSH candidate count —
      // the quantity the banding geometry actually controls — at both
      // scales, so a drifting minhash_keepers_ratio decomposes into
      // candidate growth (data shape) vs per-candidate cost
      // (algorithmic). Untimed on purpose; counts, not seconds.
      val census = Seq(
        "minhash_candidates_1x" ->
          operators.Dedup.minhashCandidateCount(read("docs1x")).toDouble,
        "minhash_candidates_10x" ->
          operators.Dedup.minhashCandidateCount(read("docs10x")).toDouble,
        // the CAPPED enumeration's census (r14): O(reps · bands ·
        // fanout) by construction — the sub-quadratic growth the
        // per-bucket cap buys against the exact path's within-cluster
        // quadratics, shown side by side with the exact counts
        "minhash_candidates_capped_1x" ->
          operators.Dedup.minhashCandidateCount(read("docs1x"), fanout = 8).toDouble,
        "minhash_candidates_capped_10x" ->
          operators.Dedup.minhashCandidateCount(read("docs10x"), fanout = 8).toDouble)
      // TABLE-FORMAT probes: a FIXED one-partition operation against a
      // 1× vs 10× table (8 vs 80 day leaves, same rows per leaf). The
      // manifest protocol's claim is O(changed leaves) commit cost —
      // replaceWhere/overwritePartitions/where-scoped z-order touch ONE
      // leaf regardless of table size, so these ratios should stay ~FLAT
      // (≈1, noise-bounded), unlike the corpus probes' ~linear 10×.
      def mkGraft(dirName: String, days: Int): weblog.IcebergLikeTable = {
        val t = weblog.IcebergLikeTable(spark, s"$scratch/$dirName", "day",
          Nil, statsColumns = Seq("a", "b"))
        t.append(spark.range(days.toLong * 5000)
          .select((col("id") % days).cast("int").as("day"),
            col("id").as("uid"),
            (col("id") % 97).as("a"), (col("id") % 89).as("b"))
          .repartition(math.min(days, 100), col("day")))
        t
      }
      def dayBatch(day: Int) = spark.range(5000)
        .select(lit(day).cast("int").as("day"),
          (col("id") + 9000000L).as("uid"),
          (col("id") % 97).as("a"), (col("id") % 89).as("b"))
      val t1 = mkGraft("graft1x", 8)
      val t10 = mkGraft("graft10x", 80)
      // MERGE-ON-READ probes (r12): keyed twin tables (8 vs 80 day
      // leaves, same rows per leaf) take the SAME fixed-size
      // equality-delete retraction (~500 day-1 keys) and then the same
      // positional predicate delete, each followed by a full masked
      // scan. The delete COMMIT is O(matched rows) — fixed across the
      // pair — and the masked SCAN is O(live rows), so the ratio must
      // sit BELOW the 10× data ratio and far below superlinear (the
      // broadcast mask is a per-reader hash probe, not a join
      // explosion). Pins that MOR reads stay linear-or-better where
      // the tuple budget admits the native mask.
      def mkKeyed(dirName: String, days: Int): weblog.IcebergLikeTable = {
        val t = weblog.IcebergLikeTable(spark, s"$scratch/$dirName", "day",
          uniqueKeys = Seq("uid"), numBuckets = 4)
        t.append(spark.range(days.toLong * 5000)
          .select((col("id") % days).cast("int").as("day"),
            col("id").as("uid"), (col("id") % 97).as("a"))
          .repartition(math.min(days, 100), col("day")))
        t
      }
      val k1 = mkKeyed("graftmor1x", 8)
      val k10 = mkKeyed("graftmor10x", 80)
      def eqDelThenScan(t: weblog.IcebergLikeTable, days: Int): Long = {
        // 500 keys, all in day 1 (uid % days == 1 → day 1)
        t.deleteMergeOnRead(col("uid") < 4000L * days &&
          col("uid") % days === 1 && col("a") % 8 === 1)
        t.read.count()
      }
      def posDelThenScan(t: weblog.IcebergLikeTable, days: Int): Long = {
        t.deletePositional(col("uid") % days === 2 && col("a") % 8 === 3)
        t.read.count()
      }
      val mor = Seq(
        "mor_eqdel_1x" -> cold(() => eqDelThenScan(k1, 8)),
        "mor_eqdel_10x" -> cold(() => eqDelThenScan(k10, 80)),
        "mor_posdel_1x" -> cold(() => posDelThenScan(k1, 8)),
        "mor_posdel_10x" -> cold(() => posDelThenScan(k10, 80)))
      val fmt = Seq(
        "replace_where_1x" ->
          cold(() => t1.replaceWhere(col("day") === 1, dayBatch(1))),
        "replace_where_10x" ->
          cold(() => t10.replaceWhere(col("day") === 1, dayBatch(1))),
        "overwrite_partitions_1x" ->
          cold(() => t1.overwritePartitions(dayBatch(2))),
        "overwrite_partitions_10x" ->
          cold(() => t10.overwritePartitions(dayBatch(2))),
        "zorder_where_1x" ->
          cold(() => t1.maintainZOrder(Seq("a", "b"), targetFiles = 2,
            where = Some(col("day") === 3))),
        "zorder_where_10x" ->
          cold(() => t10.maintainZOrder(Seq("a", "b"), targetFiles = 2,
            where = Some(col("day") === 3))))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
      // name-keyed (r14): a positional index silently mislabels every
      // ratio the moment a leg is inserted upstream
      val legs = (out ++ fmt ++ mor).toMap
      def ratio(base: String): (String, Double) =
        s"${base}_ratio" -> legs(s"${base}_10x") / legs(s"${base}_1x")
      val ratios = Seq("minhash_keepers", "minhash_keepers_capped",
        "span_removal", "binary_topk", "replace_where",
        "overwrite_partitions", "zorder_where", "mor_eqdel", "mor_posdel")
        .map(ratio)
      out ++ census ++ fmt ++ mor ++ ratios
    } catch { case e: Throwable =>
      System.err.println(s"[bench] scaling probe failed: ${e.getMessage}"); Nil }
    val sc = scaling.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")

    // calibration block + normalized numbers: every query both raw
    // (the `queries` map, cross-round-comparable only between
    // same-ambient runs) and calibration-normalized (`queries_norm` =
    // raw / (calib_engine / CALIB_ENGINE_REF) — what cross-round
    // comparisons read). The anchor legs ride along so the factor is
    // auditable from the JSON alone.
    val calib = s"""{"cpu":${r3(calibCpu)},"engine":${r3(calibEngine)},""" +
      s""""cpu_ref":$CalibCpuRef,"engine_ref":$CalibEngineRef,""" +
      s""""cpu_pre":${r3(cpuPre)},"cpu_post":${r3(cpuPost)},""" +
      s""""engine_legs":[${engineLegs.map(r3).mkString(",")}],""" +
      s""""norm_factor":${r3(normFactor)}}"""
    val qsNorm = results.map { case (k, v) =>
      "\"" + k + "\":" + r3(if (v < 0) v else v / normFactor)
    }.mkString("{", ",", "}")
    val totalNorm = r3(total / normFactor)
    // gates whose timings EXCLUDE a per-JVM shared fixture build (r14
    // policy, WebLogQueries.sharedFixture): their numbers measure the
    // proof phase only and are discontinuous with pre-r14 rounds —
    // stamped into the JSON so cross-round tooling never re-adjudicates
    // the policy change (VERDICT r14 #8).
    val fixtureShared = Seq("weblog_spj", "weblog_bucket_partition",
      "weblog_native_mor", "weblog_native_eqdel", "weblog_stats_skipping")
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","value_norm":$totalNorm,"calib":$calib,"queries":$qs,"queries_norm":$qsNorm,"isolated":$iso,"fixture_shared":$fixtureShared,"scaling":$sc,"sf":"$sfDir"}"""
    // The full per-query JSON lands in a repo file (survives any stdout
    // truncation) and is printed for whoever reads the whole log.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    println(json)
    // The LAST stdout line is a compact summary guaranteed to fit any
    // tail-capture window: r4 and r6 both lost their machine-readable
    // numbers because the full line (67+ queries) outgrew the captured
    // tail and was clipped mid-key. Headline value + the slowest
    // queries ride here; bench_out.json carries the rest.
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
    val compactQs = slowest.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","value_norm":$totalNorm,"calib":$calib,"queries":$compactQs,"n_queries":${results.size},"detail":"bench_out.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
