package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash-groupBy), normalized-exact, n-gram Jaccard (exact pairwise on
  * LSH-pruned candidates), MinHash+LSH, and SimHash. Everything is pure
  * `functions._` (codegen'd, no UDFs) and shuffles only on short keys —
  * never on full document text — so plans survive a 100 TB corpus:
  *
  *  - exact: shuffle key is a 256-bit content hash (64 bytes/doc);
  *  - minhash/simhash: signatures are computed per-row (no shuffle), then
  *    the only shuffle is the band-bucket exchange of (band, hash64, id);
  *  - candidate verification joins texts back by id, touching only the
  *    tiny candidate set instead of all n² pairs.
  */
object Dedup {

  /** Whitespace tokens of the raw text. */
  private def words(text: Column): Column = split(text, "\\s+")

  /** Word n-grams WITH duplicates over a word array (short docs yield one
    * truncated n-gram — `slice` clamps). Shared by shingling and the
    * repetition metrics; pass a materialized attribute for `w` on hot
    * paths so per-element lambdas don't re-derive it.
    */
  private[operators] def wordNgrams(w: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(w) - n, lit(0))),
      i => concat_ws(" ", slice(w, i + 1, lit(n))))

  /** Distinct word-n-gram shingles (n=1 → word set). */
  def shingles(text: Column, n: Int): Column =
    if (n == 1) array_distinct(words(text))
    else array_distinct(wordNgrams(words(text), n))

  /** Per-word 64-bit hashes — materialize this as its own projection
    * (an attribute) before windowing over it: an expression captured
    * inside a higher-order-function lambda re-evaluates per ELEMENT, so
    * passing `wordHashes(text)` straight into a window transform would
    * hash the whole document once per window (O(words²)).
    */
  private[operators] def wordHashes(text: Column): Column =
    transform(words(text), w => xxhash64(w))

  /** All word-n-gram hashes (with duplicates, truncated tail gram like
    * [[wordNgrams]]) composed from a MATERIALIZED word-hash array: each
    * window hashes its long sub-array — no gram string is ever built.
    * Words are space-free (split on `\s+`), so the concat_ws text form
    * is injective and the equality classes match hashing the gram text,
    * up to xxhash64 collisions — the trade every hashed-shingle
    * consumer already makes — while per-document byte volume drops from
    * ~n× the text (each word appears in n gram strings) to one long per
    * word plus one per window.
    *
    * Since r15 the window fold runs in the native
    * [[graft.functions.HashedNgrams]] expression — bit-identical to the
    * HOF form it replaced (`transform(sequence(...), i =>
    * xxhash64(slice(wh, i+1, n)))`, pinned by HashedNgramsSpec) but one
    * tight loop per document instead of an n-element slice allocation
    * plus a generic hash-expression re-entry per window.
    */
  private[operators] def hashedNgramsAll(wh: Column, n: Int): Column =
    if (n == 1) wh
    else org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HashedNgrams(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(wh), n))

  /** Distinct hash-composed shingles over a materialized word-hash
    * array (n=1 → distinct word hashes).
    */
  private[operators] def hashedShinglesFromHashes(wh: Column, n: Int): Column =
    array_distinct(hashedNgramsAll(wh, n))

  /** Exact dedup: one keeper (min id) per identical content. The groupBy
    * key is sha2-256 of the text, so the shuffle moves 64-byte digests,
    * not documents.
    */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(sha2(col(textCol).cast("binary"), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Case/punctuation/whitespace-insensitive exact dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  def exactNormalized(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.groupBy(sha2(normalized(col(textCol)).cast("binary"), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup of a NEW batch against an immutable ARCHIVE too large
    * to broadcast exactly — the continuous-ingestion twin of [[exact]]:
    * the archive's content digests fold into one Bloom filter (a single
    * aggregate; BITS cross the driver, never rows), the delta
    * pre-filters by membership — a bloom MISS is provably new, no
    * archive I/O spent on it — and only the bloom HITS are confirmed
    * against the real archive digests (archive scanned once, the small
    * candidate-digest set broadcast into a semi-join). Bloom filters
    * have no false negatives and false positives fail the exact
    * confirm, so the result is IDENTICAL to the exact anti-join at a
    * fraction of its cost: at 100 TB the archive contributes one
    * digest scan + ~(true dups + fpp·delta) join rows, and no document
    * text ever shuffles. Survivors then dedup among themselves
    * ([[exact]]'s min-id-per-digest). Returns
    * (content_hash, keeper_id, n_copies) — the delta keepers to append.
    *
    * Size `expectedItems` to the ARCHIVE's cardinality: a saturated
    * filter stays correct (the confirm join absorbs the extra false
    * positives) but stops saving work.
    */
  def exactDeltaKeepers(archive: DataFrame, delta: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    def dig(df: DataFrame) =
      df.select(sha2(col(textCol).cast("binary"), 256).as("content_hash"),
        col(idCol))
    val aDig = dig(archive).select("content_hash")
    // the filter sketches a 64-bit re-hash of the digest (the native
    // membership expression tests longs); an xxhash64 collision is just
    // one more false positive for the exact confirm to absorb
    val bloom = aDig.select(xxhash64(col("content_hash")).as("_h"))
      .stat.bloomFilter("_h", expectedItems, fpp)
    graft.functions.BloomMightContain.register(delta.sparkSession)
    val bloomLit = lit(graft.functions.BloomMightContain.serialize(bloom))
    val dDig = dig(delta)
    val might = call_function(graft.functions.BloomMightContain.FnName,
      xxhash64(col("content_hash")), bloomLit)
    val candidates = dDig.filter(might).select("content_hash").distinct()
    // exact confirm: one archive-digest scan, candidates broadcast —
    // false positives die here, so downstream equals the exact anti-join
    val confirmed = aDig
      .join(broadcast(candidates), Seq("content_hash"), "left_semi")
      .distinct()
    dDig.join(confirmed, Seq("content_hash"), "left_anti")
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification: output
    * (id_a, id_b, jaccard) for word-n-gram Jaccard ≥ threshold.
    *
    * Duplicative corpora (the 100 TB dedup reality: 20-40% exact/near
    * copies) would make naive LSH quadratic in cluster sizes, so docs are
    * first collapsed by *identical shingle set* (64-bit canonical set
    * hash; collision odds ~(R/2³²)² — swap in sha2 past ~10⁸ distinct
    * sets). LSH bucketing, the candidate join, and Jaccard verification
    * all run on group representatives only; member pairs are expanded
    * back at the end (identical sets ⇒ identical Jaccard, intra-group
    * pairs ⇒ exactly 1.0), which provably reproduces the full pair set.
    *
    * Candidate generation emits each pair exactly once — from its *first*
    * colliding band — via one equi-join per band on a flat long column,
    * filtered by "no earlier band collides" (plain column comparisons,
    * fully codegen'd). Near-identical docs collide in most of the `bands`
    * bands, so the classic explode-join enumerates every hot pair ~`bands`
    * times and needs a giant pair-distinct; first-match emission removes
    * that distinct and its shuffle entirely (measured at sf0.1: 37M
    * enumerated rows -> 6M exact candidates, pair-distinct was the single
    * most expensive stage). Verification intersects *hashed* shingle sets
    * (8-byte longs, not strings) — same Jaccard up to 64-bit collisions.
    */
  def minhashDedupPairs(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val (groups, repPairs) = minhashCore(df, textCol, idCol, n, k, bands, threshold)

    // intra-group: identical shingle sets, Jaccard exactly 1.0
    val intra = groups.filter(size(col("members")) > 1)
      .select(explode(flatten(transform(col("members"), (x, i) =>
        transform(slice(col("members"), i + 2, size(col("members"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), lit(1.0).as("jaccard"))

    // expand rep pairs to all member pairs across the two groups
    val expanded = repPairs
      .join(groups.select(col("rep").as("id_a"), col("members").as("ma")), "id_a")
      .join(groups.select(col("rep").as("id_b"), col("members").as("mb")), "id_b")
      .select(explode(flatten(transform(col("ma"), x =>
        transform(col("mb"), y =>
          struct(least(x, y).as("id_a"), greatest(x, y).as("id_b")))))).as("p"),
        col("jaccard"))
      .select(col("p.id_a"), col("p.id_b"), col("jaccard"))

    intra.unionAll(expanded)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The shared front of the MinHash pipeline: shingle-set collapse into
    * `groups` (setkey → rep, members, shl) and the exact-verified
    * near-dup pairs over group *representatives* only. All three frames
    * are checkpointed — every consumer fans out over them — and the
    * result is memoized per (session, input plan, params): pair
    * enumeration and keeper selection over the same corpus share one
    * signature/LSH/verification pass instead of recomputing it per query
    * (the dominant cost of the dedup family; a run that executes several
    * dedup operators over one corpus is the common shape in both the
    * correctness gate and a real pipeline).
    */
  /** Eagerly drop a localCheckpoint-backed DataFrame's cached RDD blocks
    * (the `LogicalRDD` leaf holds the checkpointed RDD). Evicted memo
    * entries must not wait for driver GC + ContextCleaner — a
    * long-running ingestion loop calling dedup per batch would
    * accumulate executor storage unboundedly in the meantime. Best
    * effort: a plan without such a leaf is a no-op.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }

  private type CoreKey = (SparkSession, String, Int, Int, Int, Double)
  // insertion-ordered with true FIFO eviction: a long-lived session
  // sweeping many corpora must not pin checkpoint blocks forever;
  // evicted entries' checkpointed RDDs are unpersisted eagerly.
  private val coreMemo =
    new java.util.LinkedHashMap[CoreKey, (DataFrame, DataFrame)](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[CoreKey, (DataFrame, DataFrame)]): Boolean = {
        val evict = size > 8
        if (evict) {
          unpersistCheckpoint(e.getValue._1)
          unpersistCheckpoint(e.getValue._2)
        }
        evict
      }
    }

  /** Cache key for an input frame, or None when the plan's leaves aren't
    * identifiable (then the core is computed uncached — never risk
    * returning another corpus's result). The key is the canonicalized
    * plan string PLUS the scan root paths AND the concrete input file
    * list (the canonicalized string alone prints `Relation [cols]
    * parquet` without the path, so reads of the same table at different
    * scale factors would collide; the file list catches a path whose
    * contents were rewritten or appended mid-session) plus any
    * local-relation data hash.
    */
  private def planKey(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LocalRelation}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val analyzed = df.queryExecution.analyzed
    val leaves = analyzed.collect { case l: LeafNode => l }
    val ids = leaves.map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => Some(fs.location.rootPaths.mkString(","))
        case _ => None
      }
      case lr: LocalRelation => Some(s"local:${lr.data.hashCode}")
      case _ => None // RDD-backed / V2 / streaming leaf: not identifiable
    }
    if (ids.exists(_.isEmpty)) None
    else Some(ids.flatten.mkString("|") +
      s"#files:${df.inputFiles.sorted.mkString(",").hashCode}" +
      "##" + analyzed.canonicalized.toString)
  }

  /** `spark.graft.dedup.memo=off` bypasses the per-plan core memo —
    * every call recomputes from the input (r16, VERDICT r15 #8). The
    * memo stays the production default (an ingestion loop sweeping one
    * corpus through several dedup views must not re-shingle it per
    * view); the bypass exists so a TIMED measurement (IsoBench A/B,
    * cold-path profiling) measures the computation instead of the
    * cache. Bypassed calls also never INSERT into the memo, so they
    * cannot evict a production entry.
    */
  val MemoKey = "spark.graft.dedup.memo"

  private def minhashCore(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, bands: Int, threshold: Double): (DataFrame, DataFrame) =
    planKey(df) match {
      case None =>
        minhashCoreCompute(df, textCol, idCol, n, k, bands, threshold)
      case _ if df.sparkSession.conf
          .getOption(MemoKey).exists(_.equalsIgnoreCase("off")) =>
        minhashCoreCompute(df, textCol, idCol, n, k, bands, threshold)
      case Some(pk) =>
        val key: CoreKey =
          (df.sparkSession, s"$textCol/$idCol/$pk", n, k, bands, threshold)
        val cached = coreMemo.synchronized(Option(coreMemo.get(key)))
        cached.getOrElse {
          // compute OUTSIDE the lock — a multi-minute Spark job must not
          // serialize unrelated dedup work; a lost race just means one
          // redundant compute whose result is discarded.
          val v = minhashCoreCompute(df, textCol, idCol, n, k, bands, threshold)
          coreMemo.synchronized {
            Option(coreMemo.get(key)).getOrElse { coreMemo.put(key, v); v }
          }
        }
    }

  /** The MinHash pipeline's front half, shared by the full core and the
    * bench's candidate census: shingle-set collapse into `groups`
    * (setkey → rep, members, shl — checkpointed, it feeds the LSH join
    * fan-out and the member expansion), representatives' shingle sets,
    * and the distinct cross-group LSH candidate pairs (each emitted
    * once, from its first colliding band).
    */
  /** The shingle/group/band-hash front shared by the FULL candidate
    * enumeration and the capped-fanout connectivity path: `groups`
    * (setkey → rep, members, shl), the representatives' shingle sets,
    * and the per-band hash columns (`_b0.._b{bands-1}`) — groups and
    * the narrow band frame checkpointed (every consumer fans out over
    * them).
    */
  private def minhashNarrow(df: DataFrame, textCol: String,
      idCol: String, n: Int, k: Int, bands: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sets = df
      .select(col(idCol).as("id"), wordHashes(col(textCol)).as("_wh"))
      .select(col("id"), hashedShinglesFromHashes(col("_wh"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), array_sort(col("sh")).as("shl"))
      .withColumn("setkey", xxhash64(col("shl")))

    // checkpointed: groups feeds the LSH join fan-out (2 sides × bands),
    // the verification joins and the member expansion — without the
    // checkpoint every consumer would recompute shingling + grouping.
    val groups = sets.groupBy("setkey").agg(
      min(col("id")).as("rep"),
      sort_array(collect_list(col("id"))).as("members"),
      first(col("shl")).as("shl"))
      .localCheckpoint()

    // cross-group LSH on representatives: the one-pass codegen'd
    // signature expression, then band hashes as flat long columns.
    // Checkpointed: it is both sides of every per-band join.
    graft.functions.MinhashSignatures.register(df.sparkSession)
    val repSets = groups.select(col("rep").as("id"), col("shl"))
    val narrow = repSets
      .select(col("id"), expr(s"minhash_sigs(shl, $k)").as("sig"))
      .select(col("id") +: (0 until bands).map(j =>
        xxhash64(lit(j) +: (0 until r).map(i => col("sig")(j * r + i)): _*).as(s"_b$j")): _*)
      .localCheckpoint()
    (groups, repSets, narrow)
  }

  /** Candidate-enumeration shape knob (r16):
    * `spark.graft.dedup.lsh.shape = perband | exploded | chunked<c>` —
    * default `perband`. All shapes emit each candidate pair EXACTLY
    * once, at its first colliding band; the sets are identical by
    * construction (census-pinned, A/B-verified byte-identical), only
    * the plan differs. MEASURED (r16, cold, memo bypassed, interleaved,
    * quiet local[32], sf0.1 probe corpora): per-band
    * 4.8–9.2 s / 8.3–9.0 s (1×/10× near-dup density), exploded
    * 2.3–2.7 s / **285–324 s**, i.e. the exploded join wins ~2× at low
    * duplication and collapses ~35× at high duplication — the narrow
    * rep frame fits the auto-broadcast threshold, so the per-band
    * joins run as broadcast probes with no buffered key groups, while
    * the 32×-row exploded side plans as a sort-merge join whose
    * duplicate-key group buffering/replay is quadratic-in-bucket work
    * per task at near-dup density. Default stays the shape that is
    * robust to the duplication structure; the knob exists for cold
    * A/Bs (IsoBench `SPARK_GRAFT_CONF`) and low-duplication corpora.
    */
  val LshShapeKey = "spark.graft.dedup.lsh.shape"

  private def minhashGroupsCandidates(df: DataFrame, textCol: String,
      idCol: String, n: Int, k: Int, bands: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val (groups, repSets, narrow) =
      minhashNarrow(df, textCol, idCol, n, k, bands)
    val shape = df.sparkSession.conf.getOption(LshShapeKey)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("perband")
    val candidates = shape match {
      case "exploded" => minhashExplodedCandidates(narrow, bands, bands)
      case s if s.startsWith("chunked") =>
        minhashExplodedCandidates(narrow, bands,
          s.stripPrefix("chunked").toInt)
      case _ => minhashPerBandCandidates(narrow, bands)
    }
    (groups, repSets, candidates)
  }

  /** Band-exploded enumeration in `ceil(bands/chunk)` self-joins over
    * the posexploded (band ordinal, bucket hash) key, each row carrying
    * its band-hash array; matched rows — one per (pair, colliding band)
    * incidence, the SAME row count the per-band joins probe in total —
    * pass the native `band_prefix_neq(bs_l, bs_r, band)` filter only at
    * the pair's FIRST colliding band, so each candidate surfaces
    * exactly once and the join needs NO distinct (the r15 exploded
    * experiment's killer — its distinct materialized and shuffled the
    * full collision multiplicity). `chunk = bands` is the single-join
    * "exploded" shape (2 exchanges instead of 64). NOT the default:
    * see [[LshShapeKey]] — at near-dup density the exploded sides
    * outgrow the broadcast threshold and the resulting sort-merge
    * join's duplicate-key group replay measured 35× slower than the
    * broadcast-probed per-band shape.
    */
  private def minhashExplodedCandidates(narrow: DataFrame,
      bands: Int, chunk: Int): DataFrame = {
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    val bandArr = array((0 until bands).map(j => col(s"_b$j")): _*)
    (0 until bands by chunk).map { c0 =>
      val hi = math.min(c0 + chunk, bands)
      val side = narrow
        .select(col("id"), bandArr.as("_bs"),
          posexplode(array((c0 until hi).map(j => col(s"_b$j")): _*))
            .as(Seq("_bo", "_bh")))
        .select(col("id"), col("_bs"),
          (col("_bo") + lit(c0)).as("_band"), col("_bh"))
      val l = side.toDF("id_l", "_bs_l", "_band_l", "_bh_l")
      val r = side.toDF("id_r", "_bs_r", "_band_r", "_bh_r")
      val firstCollision = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.BandPrefixNeq(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_bs_l")),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_bs_r")),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_band_l"))))
      l.join(r, col("_band_l") === col("_band_r") &&
          col("_bh_l") === col("_bh_r") && col("id_l") < col("id_r"))
        .filter(firstCollision)
        .select(col("id_l").as("id_a"), col("id_r").as("id_b"))
    }.reduce(_ unionAll _)
  }

  /** The default shape: one narrow join per band; a pair surfaces only
    * at its first colliding band (the `noEarlier` conjunction), so the
    * union is exactly the distinct candidate set. Never materializes
    * the collision multiplicity, and the narrow rep frame broadcasts
    * (hash probes, no buffered key groups) whenever it fits the
    * threshold — see [[LshShapeKey]] for the measured comparison.
    */
  private def minhashPerBandCandidates(narrow: DataFrame,
      bands: Int): DataFrame =
    (0 until bands).map { j =>
      val left = narrow.toDF(narrow.columns.map(c => s"${c}_l"): _*)
      val right = narrow.toDF(narrow.columns.map(c => s"${c}_r"): _*)
      val noEarlier = (0 until j)
        .map(i => col(s"_b${i}_l") =!= col(s"_b${i}_r"))
        .foldLeft(col(s"id_l") < col("id_r"))(_ && _)
      left.join(right, col(s"_b${j}_l") === col(s"_b${j}_r") && noEarlier)
        .select(col("id_l").as("id_a"), col("id_r").as("id_b"))
    }.reduce(_ unionAll _)

  /** CAPPED-FANOUT candidate pairs: within each band bucket, every
    * representative pairs with only its `fanout` successors in the
    * bucket's traversal order, so a bucket of size m emits
    * `O(m · fanout)` edges instead of `O(m²)` — the mitigation for the
    * mega-cluster pathology at 100 TB (boilerplate pages: one bucket
    * holding a million near-identical documents would otherwise emit
    * half a trillion candidate pairs; capped it emits a few million).
    * The traversal order is (next band's hash, id): members similar
    * under ANOTHER independent band sort adjacent, so a true near-dup
    * cluster inside a mixed bucket tends to occupy a contiguous run
    * and stay chain-connected.
    *
    * RECALL CONTRACT — this is a documented trade, not a free win:
    * capped candidates are a SUBSET of the full enumeration, so
    * downstream keeper components can only SPLIT, never merge —
    * `minhashKeepers(df, fanout) ⊇ minhashKeepers(df)` as sets, and a
    * split shows up as extra surviving near-dups (lower dedup recall),
    * never as a lost document. A fanout ≥ max bucket size − 1 is
    * provably identical to the full enumeration (every in-bucket pair
    * is within `fanout` successors of its smaller member). Measured on
    * the synthetic gate corpus (an adversarially collision-heavy
    * 31-word vocabulary): fanout=1 keeps 163 keepers vs the exact 150
    * at sf0.01 — which is exactly why the EXACT path stays the
    * default; real corpora with long-tail vocabularies lose far less.
    */
  private def minhashCappedCandidates(narrow: DataFrame, bands: Int,
      fanout: Int): DataFrame = {
    require(fanout >= 1, s"fanout cap must be >= 1, got $fanout")
    // ONE window over the exploded (band ordinal, bucket hash) key —
    // identical per-band bucket traversals (ordered by the NEXT band's
    // hash then id), formerly 32 separate windows = 32 shuffle+sort
    // passes over the narrow frame (r15; same collapse as the exact
    // enumeration above).
    val bandStructs = array((0 until bands).map(j =>
      struct(col(s"_b$j").as("_bh"),
        col(s"_b${(j + 1) % bands}").as("_nxt"))): _*)
    val exploded = narrow
      .select(col("id"), posexplode(bandStructs).as(Seq("_band", "_s")))
      .select(col("id"), col("_band"), col("_s._bh").as("_bh"),
        col("_s._nxt").as("_nxt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_band"), col("_bh"))
      .orderBy(col("_nxt"), col("id"))
    val leads = (1 to fanout).map(d => lead(col("id"), d).over(w))
    exploded
      .select(col("id"), array(leads: _*).as("_succ"))
      .select(col("id"), explode(col("_succ")).as("_nid"))
      .filter(col("_nid").isNotNull)
      .select(least(col("id"), col("_nid")).as("id_a"),
        greatest(col("id"), col("_nid")).as("id_b"))
      // a pair can surface from several bands/offsets: one verification
      // per distinct pair (the capped volume makes this distinct cheap —
      // O(reps · bands · fanout) rows, never quadratic)
      .distinct()
  }

  /** Plan probe for PlanSpec (r16): the candidate-enumeration frame
    * BEFORE any downstream checkpoint, so the spec can pin the physical
    * shape (one self-join, native first-collision filter, no distinct)
    * — the enumeration is invisible in every GATE's final explain
    * because the core's outputs are localCheckpoint'd (`Scan
    * ExistingRDD` leaves). Builds the narrow frames (runs their
    * checkpoint jobs); never part of a query path.
    */
  private[graft] def minhashCandidatesPlanProbe(df: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 1,
      k: Int = 128, bands: Int = 32): DataFrame =
    minhashGroupsCandidates(df, textCol, idCol, n, k, bands)._3

  /** The LSH banding's distinct cross-group candidate-pair count — the
    * quantity the band/row geometry actually controls, ahead of Jaccard
    * verification. The bench's scaling probe emits this next to the
    * keeper timings so a drifting 10× time ratio decomposes into
    * candidate growth (data shape: how much the duplication structure
    * inflates collisions) vs per-candidate cost (algorithmic). Not
    * memoized — the census is a probe, never a query dependency.
    */
  def minhashCandidateCount(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, k: Int = 128,
      bands: Int = 32, fanout: Int = 0): Long = {
    val (groups, _, candidates) =
      if (fanout <= 0) minhashGroupsCandidates(df, textCol, idCol, n, k, bands)
      else {
        val (g, r, narrow) = minhashNarrow(df, textCol, idCol, n, k, bands)
        (g, r, minhashCappedCandidates(narrow, bands, fanout))
      }
    val cnt = candidates.count()
    // drop the probe's checkpoint blocks eagerly (groups + the banded
    // narrow frame inside the candidate plan) — a census must not leave
    // executor storage behind
    unpersistCheckpoint(candidates)
    unpersistCheckpoint(groups)
    cnt
  }

  private def minhashCoreCompute(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, bands: Int, threshold: Double): (DataFrame, DataFrame) = {
    val (groups, repSets, candidates) = minhashGroupsCandidates(
      df, textCol, idCol, n, k, bands)

    // exact verification: |A∩B| via the codegen'd sorted-merge expression
    // (shl is sorted), |A∪B| = na + nb - common — no hash-set builds.
    graft.functions.SortedIntersectCount.register(df.sparkSession)
    val repPairs = candidates
      .join(repSets.toDF("id_a", "sh_a"), "id_a")
      .join(repSets.toDF("id_b", "sh_b"), "id_b")
      .withColumn("common", expr("sorted_intersect_count(sh_a, sh_b)"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      // checkpointed too: pair expansion, clustering and keeper selection
      // all re-scan the verified pair set; materializing it here costs
      // nothing extra (clusters() would otherwise materialize the same
      // data in its edge-list checkpoint) and makes every consumer reuse
      // one verification pass.
      .localCheckpoint()

    (groups, repPairs)
  }

  /** One keeper (min id) per near-duplicate cluster, WITHOUT
    * materializing the expanded pair set: equivalent to
    * `keepers(df, minhashDedupPairs(df, ...))` but connected components
    * run on the group-representative graph only. A group's members form
    * a clique around their rep (= the group's min id), so the component
    * label of the rep IS the min doc id of the whole cluster; every
    * member other than its group's cluster label is dropped. The clique
    * pairs — quadratic in the corpus duplication rate, the dominant term
    * of pair expansion at 100 TB — are never generated (measured ~2x
    * end-to-end at sf0.1; the gate checks equality with the O(n²)
    * oracle either way).
    */
  def minhashKeepers(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val (groups, repPairs) = minhashCore(df, textCol, idCol, n, k, bands, threshold)
    val labels = clusters(repPairs.select(col("id_a"), col("id_b")),
      pairsMaterialized = true)
    val drop = groups
      .join(labels.withColumnRenamed("id", "rep"), Seq("rep"), "left_outer")
      .select(explode(col("members")).as(idCol),
        coalesce(col("cluster"), col("rep")).as("cluster"))
      .filter(col(idCol) =!= col("cluster"))
      .select(idCol)
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** [[minhashKeepers]] with the CAPPED per-band-bucket candidate
    * enumeration ([[minhashCappedCandidates]] — `O(m · fanout)` edges
    * per bucket instead of `O(m²)`): the keeper variant for corpora
    * with mega-duplicate clusters, where the exact enumeration's
    * within-bucket quadratics dominate everything else at 100 TB.
    * Recall contract documented on the candidate generator: the result
    * is a SUPERSET of the exact keepers (components can split, never
    * merge — no document is ever lost, some near-dups may survive),
    * and `fanout ≥ max bucket size − 1` reproduces the exact result.
    * The EXACT [[minhashKeepers]] stays the default/gate path.
    */
  def minhashKeepersCapped(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, fanout: Int = 8): DataFrame = {
    val (groups, repSets, narrow) =
      minhashNarrow(df, textCol, idCol, n, k, bands)
    graft.functions.SortedIntersectCount.register(df.sparkSession)
    val edges = minhashCappedCandidates(narrow, bands, fanout)
      .join(repSets.toDF("id_a", "sh_a"), "id_a")
      .join(repSets.toDF("id_b", "sh_b"), "id_b")
      .withColumn("common", expr("sorted_intersect_count(sh_a, sh_b)"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"))
    val labels = clusters(edges)
    val drop = groups
      .join(labels.withColumnRenamed("id", "rep"), Seq("rep"), "left_outer")
      .select(explode(col("members")).as(idCol),
        coalesce(col("cluster"), col("rep")).as("cluster"))
      .filter(col(idCol) =!= col("cluster"))
      .select(idCol)
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over the distinct-word hash set (per-row, no shuffle):
    * bit j is 1 iff more word hashes have bit j set than not. Callers
    * must have a session — register via [[graft.functions.SimhashFromHashes]]
    * (the public operators here do it for you).
    */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(array_distinct(words(text)), w => xxhash64(w)))

  /** SimHash of a materialized word-hash array — one compiled pass over
    * all 64 bit balances via the native `simhash_from_hashes` expression
    * (the 64-fold HOF version it replaces re-scanned the array once per
    * bit, interpreted; ExpressionPropertySpec pins equality to the
    * strict-majority model).
    */
  def simhashFromHashes(hashes: Column): Column =
    call_function(graft.functions.SimhashFromHashes.FnName, hashes)

  /** Engine-replayable 60-bit word hash: the first 15 hex digits of the
    * word's MD5 as a bigint. MD5 is a cross-engine standard, so an
    * external SQL engine (the DuckDB oracle) reproduces it bit-for-bit —
    * unlike `xxhash64`, whose seed/implementation is Spark-private. Use
    * for hash-checking hash-bucketed pipelines end-to-end; production
    * paths keep `xxhash64` (no string round-trip, codegen'd).
    */
  def md5WordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** SimHash near-dup pairs: bucket by 4×16-bit bands (any pair within
    * Hamming distance 3 shares at least one intact band), verify with
    * bit_count(xor) ≤ maxHamming. `wordHash` is the per-word 64-bit hash
    * (default `xxhash64`; pass [[md5WordHash]] for an oracle-replayable
    * run of the identical banding + verification pipeline).
    */
  def simhashDedupPairs(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3,
      wordHash: Column => Column = w => xxhash64(w)): DataFrame = {
    graft.functions.SimhashFromHashes.register(df.sparkSession)
    val sh = df
      .select(col(idCol),
        transform(filter(array_distinct(words(col(textCol))), w => length(w) > 0),
          wordHash).as("_h"))
      .select(col(idCol), simhashFromHashes(col("_h")).as("sh"))
    val banded = sh.select(col(idCol), col("sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), j * 16).bitwiseAND(0xFFFF)): _*)))
      .toDF(idCol, "sh", "band", "bucket")
    val a = banded.toDF("id_a", "sh_a", "band", "bucket")
    val b = banded.toDF("id_b", "sh_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-dup pair graph (id_a, id_b).
    *
    * Hybrid by edge count: after shingle-set collapse the rep graph is
    * tiny relative to the corpus (near-dup graphs are sparse), so below
    * `driverSolveMaxEdges` the edge list is collected and solved with
    * union-find on the driver — O(m α(m)) in milliseconds, zero Spark
    * rounds. Above the bound: iterative min-label propagation — every
    * node adopts the smallest label among itself and its neighbors until
    * fixpoint. Near-dup clusters are near-cliques, so convergence takes
    * O(cluster diameter) ≈ 2-4 rounds regardless of corpus size; each
    * round is one shuffle on node id. `localCheckpoint` truncates the
    * growing lineage so the loop's plan stays flat.
    *
    * Throws if the loop exits via `maxIter` without reaching a fixpoint
    * (a chain-shaped graph with diameter > maxIter) — unconverged labels
    * must not masquerade as cluster assignments.
    *
    * Returns (id, cluster) where cluster = min doc id of the component.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 30,
      pairsMaterialized: Boolean = false,
      driverSolveMaxEdges: Long = 4000000L): DataFrame = {
    // checkpoint the edge list once: `pairs` is typically an expensive
    // pipeline (LSH candidates + verification), and the loop scans edges
    // in every round — without this the full pair computation re-runs
    // per iteration (measured 8x slower at sf0.1). Callers whose pairs
    // are ALREADY a checkpointed frame (minhashKeepers) skip the second
    // materialization — re-scanning cached pairs twice per round is
    // cheaper than copying them.
    val edgesPlan = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val edges = if (pairsMaterialized) edgesPlan else Checkpoints.cut(edgesPlan)
    // counting the (materialized) edge frame is cheap; the collect below
    // is bounded by driverSolveMaxEdges undirected edges of two longs
    // (the src<dst filter keeps one direction of each symmetrized pair).
    // The driver path assumes 64-bit ids — any other id type falls
    // through to the type-agnostic distributed loop.
    val longIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && edges.count() / 2 <= driverSolveMaxEdges) {
      val raw = edges.filter(col("src") < col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      // union-by-min: the larger root is parented under the smaller, so
      // every component's final root IS its min node id.
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = raw.iterator.flatMap(e => Iterator(e._1, e._2)).toArray.distinct
      val spark = pairs.sparkSession
      import spark.implicits._
      return nodes.toSeq.map(id => (id, find(id))).toDF("id", "cluster")
    }
    var labels = Checkpoints.cut(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id")))
    // one propagation round: every node takes the min label among itself
    // and its neighbors; extra columns (the convergence marker) ride along
    def step(l: DataFrame): DataFrame = {
      val neighborMin = edges
        .join(l.select(col("id").as("src"), col("cluster")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      l.join(neighborMin, Seq("id"), "left_outer")
        .withColumn("cluster",
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))))
        .drop("nmin")
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // two propagation rounds per materialization + convergence check:
      // labels only ever decrease, so "no change across the fused double
      // round" still implies a fixpoint, at half the checkpoint/count
      // actions (the loop's real cost — each round's join work is cheap
      // next to eagerly materializing its result).
      val next = Checkpoints.cut(
        step(step(labels.withColumn("_old", col("cluster")))))
      val changed = next.filter(col("cluster") =!= col("_old")).count()
      labels = next.drop("_old")
      converged = changed == 0
      i += 2
    }
    if (!converged)
      throw new IllegalStateException(
        s"clusters() did not converge within $maxIter label-propagation rounds " +
          "(graph diameter exceeds maxIter); raise maxIter")
    labels
  }

  /** Keeper selection: the full corpus minus every near-duplicate that is
    * not its cluster's representative (min id). Docs outside the pair
    * graph keep themselves.
    */
  /** Corpus dedup REPORT — the summary every production dedup job emits
    * alongside its keepers: corpus size, near-dup cluster count and
    * shape, how many documents deduplication removes. Computed from the
    * SAME MinHash+LSH pair graph and connected components as the keeper
    * selection, collapsed to one metric→value row each; the per-cluster
    * aggregation shuffles only (cluster, 1) rows and the final fold is
    * a 1-row collect.
    */
  def dedupReport(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1,
      threshold: Double = 0.8): DataFrame = {
    import df.sparkSession.implicits._
    val pairs = minhashDedupPairs(df, textCol, idCol, n, threshold = threshold)
    val sizes = clusters(pairs).groupBy("cluster").agg(count(lit(1)).as("sz"))
    val nDocs = df.count()
    val agg = sizes
      .agg(count(lit(1)).as("nc"), sum("sz").as("dic"), max("sz").as("lg"))
      .collect().head
    val nc = agg.getLong(0)
    val dic = Option(agg.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val lg = Option(agg.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val dup = dic - nc // one keeper survives per cluster
    Seq(
      ("corpus_docs", nDocs),
      ("docs_in_clusters", dic),
      ("dup_clusters", nc),
      ("duplicate_docs", dup),
      ("keeper_docs", nDocs - dup),
      ("largest_cluster", lg))
      .toDF("metric", "value")
      .orderBy("metric")
  }

  def keepers(df: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val drop = clusters(pairs).filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Quality-aware keeper selection: per near-dup cluster keep the row
    * maximizing `scoreCol` (ties broken by min id) instead of blindly
    * keeping the min id — the realistic training-pipeline policy (keep
    * the cleanest copy, not the first-crawled one). One extra shuffle on
    * the cluster label; rows outside the pair graph keep themselves.
    */
  def keepersBy(df: DataFrame, pairs: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val labels = clusters(pairs).withColumnRenamed("id", idCol)
    val scored = df.join(labels, Seq(idCol), "left_outer")
      .withColumn("_cluster", coalesce(col("cluster"), col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_cluster"))
      .orderBy(col(scoreCol).desc, col(idCol))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_cluster", "cluster")
  }

  /** Benchmark decontamination: (corpus_id, ref_id, jaccard) for every
    * corpus document whose word-n-gram Jaccard against a reference
    * (benchmark / eval-set) document reaches `threshold`. The reference
    * side is tiny by definition (benchmarks are KB–MB against a 100 TB
    * corpus), so the ENTIRE reference side becomes one broadcast
    * inverted index and the corpus is answered in a SINGLE scan pass —
    * zero joins, zero shuffles, zero candidate materialization.
    *
    * r14 plan change. The previous shape was PPJoin prefix filtering
    * (prefix-posting candidate join → pair distinct → broadcast verify
    * join with `sorted_intersect_count`). Prefix filtering is the right
    * tool when candidates are JOIN rows that must be minimized — but
    * here the reference side fits in memory by contract, so candidates
    * never need to exist as rows at all: the
    * [[graft.functions.RefJaccardPairs]] expression probes each corpus
    * document's shingle hashes against the index (binary search over
    * the sorted gram table), accumulates per-ref overlap counters
    * (touched-list reset — O(grams + collisions) per row, never
    * O(refs)), and emits exactly the qualifying (ref_id, jaccard)
    * matches. The collision volume the old plan shuffled and
    * distinct-ed as millions of candidate rows (98% of the cross
    * product survived the prefix filter on the short-document fixture)
    * becomes array increments inside the scan stage. Same arithmetic
    * (int counts, double division, round-6 after an unrounded
    * threshold compare), so results are bit-identical to the join plan
    * and the DuckDB oracle.
    *
    * The one driver-side action is collecting the reference sets to
    * build the index — bounded by the benchmark suite's size, never
    * the corpus (the same contract the old plan's `broadcast(r)` and
    * Bloom build relied on). Counts are identical to string shingles
    * up to 64-bit hash collisions (the same trade minhash verification
    * makes).
    */
  def contaminationPairs(corpus: DataFrame, ref: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 1,
      threshold: Double = 0.8): DataFrame = {
    def sets(df: DataFrame, out: String) = df
      .select(col(idCol).as(out), wordHashes(col(textCol)).as("_wh"))
      .select(col(out),
        array_sort(hashedShinglesFromHashes(col("_wh"), n)).as("shl"))
      .filter(size(col("shl")) > 0)
    val c = sets(corpus, "corpus_id")
    val refSets = sets(ref, "ref_id").collect().map(row =>
      (row.getLong(0),
        row.getSeq[Long](1).toArray))
    val index = graft.functions.RefJaccardPairs.buildIndex(refSets.toSeq)
    val indexLit = lit(graft.functions.RefJaccardPairs.serialize(index))
    graft.functions.RefJaccardPairs.register(corpus.sparkSession)
    c.select(col("corpus_id"),
        explode(call_function(graft.functions.RefJaccardPairs.FnName,
          col("shl"), indexLit, lit(threshold))).as("m"))
      .select(col("corpus_id"), col("m.ref_id").as("ref_id"),
        round(col("m.jaccard"), 6).as("jaccard"))
  }

  /** Count-based decontamination — the industry-standard "any shared
    * 13-gram" rule: (corpus_id, ref_id, common) for corpus documents
    * sharing at least `minCommon` distinct word-n-grams with a reference
    * document. Long shingles are near-unique, so the broadcast posting
    * join's output is proportional to TRUE contamination (no stopword
    * blowup, no prefix filter needed); postings carry 8-byte shingle
    * hashes and the corpus never shuffles a document.
    */
  def ngramOverlap(corpus: DataFrame, ref: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 13,
      minCommon: Int = 1): DataFrame = {
    def post(df: DataFrame, out: String) = df
      .select(col(idCol).as(out), wordHashes(col(textCol)).as("_wh"))
      .select(col(out), explode(hashedShinglesFromHashes(col("_wh"), n)).as("s"))
    post(corpus, "corpus_id")
      .join(broadcast(post(ref, "ref_id")), "s")
      .groupBy("corpus_id", "ref_id")
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
  }

  /** `ngramOverlap` for when the reference side is too large to broadcast
    * as postings: build a Bloom filter over the reference's shingle
    * hashes (Spark's distributed tree-aggregate sketch — a few MB for
    * millions of grams), ship the compact filter with the plan, and
    * pre-prune corpus postings BEFORE the exact join — inside whole-stage
    * codegen via the native `bloom_might_contain` expression — so the
    * join input shrinks to ~(true matches + fpp · postings) instead of
    * every corpus gram.
    * Bloom filters have no false negatives and false positives fail the
    * exact join, so the result is IDENTICAL to `ngramOverlap` (the gate
    * shares its oracle). The reference postings are computed twice (once
    * for the sketch, once for the join) — both are one scan of the
    * (small-relative-to-corpus) reference set.
    */
  def ngramOverlapBloom(corpus: DataFrame, ref: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 13,
      minCommon: Int = 1, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    def post(df: DataFrame, out: String) = df
      .select(col(idCol).as(out), wordHashes(col(textCol)).as("_wh"))
      .select(col(out), explode(hashedShinglesFromHashes(col("_wh"), n)).as("s"))
    val rPost = post(ref, "ref_id")
    val bloom = rPost.stat.bloomFilter("s", expectedItems, fpp)
    graft.functions.BloomMightContain.register(corpus.sparkSession)
    val bloomLit = lit(graft.functions.BloomMightContain.serialize(bloom))
    post(corpus, "corpus_id")
      .filter(call_function(graft.functions.BloomMightContain.FnName, col("s"), bloomLit))
      .join(rPost, "s")
      .groupBy("corpus_id", "ref_id")
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
  }

  /** Span-level duplication census — the "duplicated substring" view of
    * the corpus (the signal behind suffix-array dedup à la Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): every
    * word n-gram occurring in at least `minDocs` distinct documents,
    * with its document count and total occurrence count. Two cascaded
    * aggregations keyed on the 64-bit gram hash (8-byte shuffle keys);
    * the census itself never materializes a gram STRING — text is
    * attached afterwards for the (duplication-bounded) survivors only,
    * so at petabyte scale the string phase stays proportional to real
    * duplication, not the corpus. Counts are exact up to 64-bit hash
    * collisions (the standard trade).
    *
    * `broadcastSurvivors` (default true) hints the survivor-hash side of
    * the text-attach join for broadcast; on a boilerplate-heavy corpus
    * where duplication is NOT small, set it false to fall back to a
    * sort-merge join instead of risking a driver/executor OOM on the
    * broadcast build.
    */
  def duplicateSpans(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 13, minDocs: Int = 2,
      broadcastSurvivors: Boolean = true): DataFrame = {
    // phase 1: census on hash-composed grams only — no gram string is
    // ever built, and the two aggregations shuffle pure longs.
    // Checkpointed (r14): BOTH downstream consumers (the survivor
    // filter and the final attach join) re-scanned the census plan —
    // the two cascaded aggregations ran twice.
    val counts = df
      .select(col(idCol).as("_id"), wordHashes(col(textCol)).as("_wh"))
      .select(col("_id"), explode(hashedNgramsAll(col("_wh"), n)).as("_gh"))
      .groupBy("_gh", "_id").agg(count(lit(1)).as("_occ"))
      .groupBy("_gh")
      .agg(count(lit(1)).as("n_docs"), sum("_occ").as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
      .localCheckpoint()
    // phase 2: attach the reporting text for the duplicated grams only.
    // The survivor BLOOM pre-filters window POSITIONS inside the
    // projection (r14), so a gram string is only ever concatenated for
    // a (probable) survivor — on a mostly-unique corpus the string
    // construction cost drops to ~the duplication rate; false
    // positives just build a string that dies in the exact join below.
    graft.functions.BloomMightContain.register(df.sparkSession)
    val bloomLit: Option[Column] =
      if (!broadcastSurvivors) None
      else {
        val items = math.max(counts.count(), 1L) // checkpointed: cheap
        Some(lit(graft.functions.BloomMightContain.serialize(
          counts.stat.bloomFilter("_gh", items, 0.03))))
      }
    val texts = {
      // the gram-hash array is materialized as its OWN attribute before
      // any lambda touches it (r15): the former per-position
      // `xxhash64(slice(_wh, i+1, n))` re-hashed each window inside the
      // bloom probe AND again when building the survivor struct; now
      // both are element_at lookups into one native hashed_ngrams pass.
      val base = df
        .select(words(col(textCol)).as("_w"))
        .select(col("_w"), transform(col("_w"), x => xxhash64(x)).as("_wh"))
        .select(col("_w"), hashedNgramsAll(col("_wh"), n).as("_gh"))
      def ghOf(i: Column) = element_at(col("_gh"), i + 1)
      val positions = sequence(lit(0), greatest(size(col("_w")) - n, lit(0)))
      val kept = bloomLit.fold(positions)(b => filter(positions, i =>
        call_function(graft.functions.BloomMightContain.FnName, ghOf(i), b)))
      base.select(explode(transform(kept,
          i => struct(ghOf(i).as("_gh"),
            concat_ws(" ", slice(col("_w"), i + 1, lit(n))).as("gram")))).as("p"))
        .select(col("p._gh").as("_gh"), col("p.gram").as("gram"))
        // explicit broadcast: without the hint a conservative size
        // estimate degrades this to a sort-merge join that shuffles
        // EVERY gram string — the exact cost this rewrite exists to
        // avoid. The survivor hash set is duplication-bounded (8 bytes
        // per duplicated gram); at extreme duplication rates callers
        // opt out via broadcastSurvivors = false (no code edit needed).
        .join(if (broadcastSurvivors) broadcast(counts.select("_gh"))
              else counts.select("_gh"), "_gh")
        .groupBy("_gh").agg(min("gram").as("gram"))
    }
    counts.join(texts, "_gh")
      .select("gram", "n_docs", "n_occurrences")
  }

  /** ExactSubstr-style duplicated-span REMOVAL — the rewrite counterpart
    * of [[duplicateSpans]] (after Lee et al., "Deduplicating Training
    * Data Makes Language Models Better": cut the duplicated substring,
    * keep the rest of the document): every word position covered by any
    * occurrence of a word n-gram appearing in ≥ `minDocs` distinct
    * documents is removed, and the surviving words are re-joined.
    * Returns (idCol, clean_text, n_words, n_removed) for every document
    * (documents without duplicated spans pass through unchanged).
    *
    * Scale: the census and hit-detection shuffles carry only (gram hash,
    * doc id, position) longs — never text; per-document cut lists
    * collapse to ONE short row per AFFECTED document (start positions
    * only), so the final left join against the corpus streams the scan
    * and, duplication being contamination-bounded, typically broadcasts
    * the cut side under AQE (bucket the corpus by `idCol` to co-locate
    * it outright at 100 TB). The word filter itself is a per-row
    * projection.
    *
    * Hash-collision caveat: unlike the advisory [[duplicateSpans]]
    * census (where a 64-bit collision merely inflates a count), this
    * operator is DESTRUCTIVE — a gram whose hash collides with a
    * genuinely duplicated gram gets its span CUT from legitimate
    * documents. At 64 bits the expected collision count stays ≪ 1 up to
    * billions of distinct grams (birthday bound ~2^32 grams for even
    * odds); where exactness matters more than that, verify survivor
    * grams by text for the affected documents before rewriting.
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 13, minDocs: Int = 2): DataFrame = {
    // checkpointed: the posting set feeds BOTH the census (→ dup) and
    // the hit join — without it the corpus scan + word hashing + window
    // hashing (the operator's dominant CPU) runs twice. The
    // materialization is posting-set-proportional (3 longs per gram);
    // at extreme scale trade it back for recompute consciously.
    val grams = df
      .select(col(idCol).as("_id"), wordHashes(col(textCol)).as("_wh"))
      .select(col("_id"),
        posexplode(hashedNgramsAll(col("_wh"), n)).as(Seq("_pos", "_gh")))
      .localCheckpoint()
    val dup = grams.groupBy("_gh")
      .agg(count_distinct(col("_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select("_gh")
    val cuts = grams.join(dup, "_gh")
      .groupBy(col("_id").as(idCol))
      .agg(sort_array(collect_set(col("_pos"))).as("_starts"))
    rebuildWithoutSpans(df, cuts, textCol, idCol, n)
  }

  /** Shared rewrite tail for span-cut operators: given per-document
    * sorted cut-start lists (`_starts`), remove every covered word
    * position and re-join the survivors. Covered = union of
    * [start, start + n) ranges; positions past the end (a truncated
    * short-doc gram) are ignored by the length guard. Left join: docs
    * without cuts pass through unchanged.
    */
  private def rebuildWithoutSpans(df: DataFrame, cuts: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val covered = array_distinct(flatten(transform(
      coalesce(col("_starts"), array().cast("array<int>")),
      s => sequence(s, s + lit(n - 1)))))
    df.join(cuts, Seq(idCol), "left_outer")
      .withColumn("_w", words(col(textCol)))
      .withColumn("_cov", covered)
      .select(col(idCol),
        array_join(filter(col("_w"),
          (_, i) => !array_contains(col("_cov"), i)), " ").as("clean_text"),
        size(col("_w")).as("n_words"),
        size(filter(col("_cov"), p => p < size(col("_w")))).as("n_removed"))
  }

  /** Span-level benchmark decontamination — the surgical counterpart of
    * [[decontaminate]] (which drops whole documents): every corpus word
    * position covered by an occurrence of a word n-gram that ALSO
    * occurs in the reference (benchmark/eval) set is cut, and the
    * surviving words re-joined — the "remove the benchmark text, keep
    * the document" rule used when contaminated documents are too
    * valuable to drop wholesale. Returns (idCol, clean_text, n_words,
    * n_removed) for every corpus document.
    *
    * Scale: the reference's distinct gram hashes are BROADCAST
    * (benchmarks are KB–MB against a 100 TB corpus), hit detection is a
    * broadcast join on 8-byte hashes against the corpus's scan-stage
    * posting stream, and cut lists collapse to one short row per
    * AFFECTED document — the corpus never shuffles text. Destructive
    * under 64-bit gram-hash collisions like [[removeDuplicateSpans]]
    * (same caveat, same bound).
    */
  def removeContaminatedSpans(corpus: DataFrame, ref: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 13): DataFrame = {
    val refGrams = ref
      .select(wordHashes(col(textCol)).as("_wh"))
      .select(explode(hashedNgramsAll(col("_wh"), n)).as("_gh"))
      .distinct()
    val grams = corpus
      .select(col(idCol).as("_id"), wordHashes(col(textCol)).as("_wh"))
      .select(col("_id"),
        posexplode(hashedNgramsAll(col("_wh"), n)).as(Seq("_pos", "_gh")))
    val cuts = grams.join(broadcast(refGrams), "_gh")
      .groupBy(col("_id").as(idCol))
      .agg(sort_array(collect_set(col("_pos"))).as("_starts"))
    rebuildWithoutSpans(corpus, cuts, textCol, idCol, n)
  }

  /** The corpus minus every document contaminated by the reference set
    * (any Jaccard ≥ threshold match) — one broadcast pass + a left-anti
    * join on the (short) contaminated-id list.
    */
  def decontaminate(corpus: DataFrame, ref: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 1,
      threshold: Double = 0.8): DataFrame = {
    val bad = contaminationPairs(corpus, ref, textCol, idCol, n, threshold)
      .select(col("corpus_id").as(idCol)).distinct()
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** Incremental near-dup dedup — the continuous-ingestion shape: the
    * `existing` frame is an already-deduplicated keeper corpus
    * (immutable; its docs are never dropped), and a NEW batch is reduced
    * to the docs worth appending. A delta doc is dropped when its
    * word-n-gram Jaccard against ANY existing keeper reaches
    * `threshold`; the remainder is then deduplicated among itself
    * (MinHash+LSH, connected components, min id per cluster). Returns
    * the delta keepers — append them to `existing` to advance the
    * corpus, batch after batch.
    *
    * Scale: the delta side is small relative to the corpus by
    * definition (a micro-batch against 100 TB), so the cross-check runs
    * as [[contaminationPairs]] with the DELTA broadcast — one pass over
    * the existing corpus, which never shuffles a document. A production
    * deployment would persist the existing side's sorted shingle-hash
    * arrays next to the corpus (they are exactly the `shl` column the
    * minhash core computes) to skip re-shingling the archive per batch;
    * the semantics here are unchanged by that caching.
    */
  // result-level memo for incrementalKeepers: the derived `fresh` frame
  // is checkpoint-backed (unidentifiable plan leaves), so the core memo
  // can't key it — memoize the whole checkpointed result on the two
  // INPUT plans instead. The two plan keys and the param string are
  // SEPARATE tuple fields — concatenating them could alias different
  // input pairs (canonicalized plan strings can contain any separator,
  // e.g. `||` from a boolean OR). Same bounded-FIFO policy as coreMemo.
  private type IncKey = (SparkSession, String, String, String)
  private val incMemo =
    new java.util.LinkedHashMap[IncKey, DataFrame](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[IncKey, DataFrame]): Boolean = {
        val evict = size > 8
        if (evict) unpersistCheckpoint(e.getValue)
        evict
      }
    }

  def incrementalKeepers(existing: DataFrame, delta: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 1,
      k: Int = 128, bands: Int = 32, threshold: Double = 0.8): DataFrame = {
    def compute(): DataFrame = {
      // the contaminated-id list is small (bounded by the batch) and
      // feeds BOTH the dedup core and the final anti-join — checkpoint
      // it so the archive cross-check scans once per call
      val hits = contaminationPairs(existing, delta, textCol, idCol, n, threshold)
        .select(col("ref_id").as(idCol)).distinct()
        .localCheckpoint()
      val fresh = delta.join(hits, Seq(idCol), "left_anti")
      minhashKeepers(fresh, textCol, idCol, n, k, bands, threshold)
    }
    val key: Option[IncKey] = for { a <- planKey(existing); b <- planKey(delta) }
      yield (existing.sparkSession, a, b,
        s"$textCol/$idCol/$n/$k/$bands/$threshold")
    key match {
      case None => compute()
      case Some(kk) =>
        val cached = incMemo.synchronized(Option(incMemo.get(kk)))
        cached.getOrElse {
          val v = compute().localCheckpoint()
          incMemo.synchronized {
            Option(incMemo.get(kk)).getOrElse { incMemo.put(kk, v); v }
          }
        }
    }
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold via an inverted-index
    * join (explode shingles, join on shingle, count co-occurrences) —
    * the classic scalable exact algorithm: work is proportional to
    * posting-list sizes, not n². Common-shingle skew is the known
    * hazard at scale; pair with a document-frequency cut (`maxDf`).
    */
  def jaccardPairs(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, threshold: Double = 0.8,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(explode(shingles(col(textCol), n)).as("s"), col(idCol).as("id"))
    val pruned =
      if (maxDf == Long.MaxValue) sh
      else {
        val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
        sh.join(dfreq.select("s"), "s")
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = pruned.toDF("s", "id_a").join(pruned.toDF("s", "id_b"), "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
