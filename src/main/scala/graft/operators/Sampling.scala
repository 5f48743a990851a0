package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, reproducible corpus sampling for training-data
  * pipelines. `df.sample()` is neither stable across runs/partition
  * layouts nor auditable; these operators key the keep decision on a
  * column value, so the same rows are kept in every run, on any cluster
  * layout, at any scale — and any engine can recompute the sample. All
  * are codegen'd per-row filters: no shuffle, pushdown-friendly.
  */
object Sampling {

  /** Systematic 1-in-m sampling keyed on an id column. Use when ids are
    * uncorrelated with content; otherwise prefer [[everyNthHashed]].
    */
  def everyNth(df: DataFrame, idCol: String, m: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(m)) === 0)

  /** 1-in-m sampling on a 64-bit hash of the key — the production
    * default: immune to id-ordering bias, still fully deterministic.
    */
  def everyNthHashed(df: DataFrame, keyCol: String, m: Int): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol)), lit(m)) === 0)

  /** Stratified systematic sampling: per-stratum 1-in-m rates; strata
    * without a configured rate are dropped (an explicit allowlist — a
    * typoed stratum surfaces as missing rows, not a silent full copy).
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Int]): DataFrame = {
    val m: Column = rates.foldLeft(lit(null).cast("int")) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("_m", m)
      .filter(col("_m").isNotNull && pmod(col(idCol), col("_m")) === 0)
      .drop("_m")
  }

  /** Engine-replayable uniform in [0,1): the top 60 bits of md5(key),
    * scaled by 2^-60. Unlike `rand()` (layout-dependent) or `xxhash64`
    * (Spark-private seed), any engine recomputes the identical value, so
    * a sample drawn from it is auditable end-to-end. Production paths
    * that never need cross-engine replay can swap in xxhash64.
    */
  def hashUniform(key: Column): Column =
    Dedup.md5WordHash(key.cast("string")) / lit(math.pow(2, 60))

  /** Deterministic TRAINING ORDER: seeded global shuffle + shard layout
    * — the last step before a corpus feeds distributed dataloaders
    * (worker w reads shard w in `pos` order; re-running with the same
    * seed reproduces the exact order, the requirement for resumable and
    * reproducible training runs). `shard = h(seed‖id) mod nShards`,
    * `pos` = the rank of an independent `h(seed+ord‖id)` within the
    * shard. One narrow (id, shard, key) exchange; each shard orders
    * independently, so parallelism = nShards — size the shard count to
    * the cluster (thousands at 100 TB) and every window stays a
    * bounded partition. Hashes are the replayable md5 family
    * ([[hashUniform]]'s rationale); production paths that never
    * cross-engine-replay can swap in xxhash64.
    */
  def trainingOrder(df: DataFrame, nShards: Int, seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val shardKey = Dedup.md5WordHash(
      concat(lit(s"sh$seed:"), col(idCol).cast("string")))
    val ordKey = Dedup.md5WordHash(
      concat(lit(s"ord$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_ord"), col(idCol))
    df.select(col(idCol),
        pmod(shardKey, lit(nShards.toLong)).cast("int").as("shard"),
        ordKey.as("_ord"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_ord")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis): key
    * each row by u^(1/w) with u = [[hashUniform]], keep the k largest.
    * Rows are kept with probability proportional to `weightCol` (e.g.
    * length- or quality-proportional subsampling), yet the draw is fully
    * deterministic and replayable. Top-k is TakeOrderedAndProject — a
    * per-partition heap + single k-row merge, no global sort, no
    * shuffle of the corpus. Ties (~2^-60) break on the key column.
    *
    * Cross-engine caveat: `pow` may differ by an ulp between libm
    * implementations, so two keys within ~1e-15 of each other could in
    * principle rank differently in another engine; with 60-bit uniforms
    * the chance any such near-tie exists is ~n²·1e-15 — negligible at
    * gate scale and deterministic within Spark regardless.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame =
    // w ≤ 0 is undefined in the E-S scheme (1/w flips the key ordering:
    // a negative weight would beat every valid row, w = 0 could never be
    // drawn) — such rows are excluded rather than silently mis-ranked.
    df.filter(col(weightCol) > 0)
      .withColumn("_wk",
        pow(hashUniform(col(keyCol)), lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("_wk").desc, col(keyCol))
      .limit(k)
      .drop("_wk")

  /** Per-source document cap — the "at most N pages per domain" rule of
    * web-corpus curation (C4/RefinedWeb-style), preferring rows with the
    * highest `prefCol` (quality proxy), ties broken on `idCol` so the
    * kept set is unique and layout-independent. The rank-≤-N filter is
    * rewritten by Spark's WindowGroupLimit to a per-partition top-N
    * before the window sort — per-source state is O(N), so one giant
    * domain can't skew the stage.
    */
  def capPerSource(df: DataFrame, sourceCol: String, prefCol: String,
      idCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(prefCol).desc, col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }

  /** Token-budget corpus mixing: per source, keep documents in
    * deterministic id order until the source's token budget is reached —
    * the "data mixture weights" step of a training pipeline, expressed
    * so the mix is reproducible and auditable (same docs on every run,
    * any layout, any engine). A document is kept iff the cumulative
    * token count BEFORE it is still under budget, so the straddling doc
    * is included (budgets are floors, matching Packing's bin rule) and a
    * single over-budget doc can't starve its source. Sources without a
    * budget are dropped (explicit allowlist, like [[stratified]]). One
    * shuffle on the source column; the cumsum is a per-source window.
    *
    * Contract: `idCol` must be unique within a source (a primary key) —
    * with duplicate ids the running sum's tie order, and therefore which
    * boundary doc is kept, would be layout-dependent.
    */
  /** Leakage-safe train/val/test splitting: the split is a pure hash of
    * a GROUP key, so every row sharing the key — all pages of a domain,
    * all members of a near-dup cluster — lands in the SAME split. That
    * grouping is what prevents test-set leakage: splitting i.i.d. by row
    * puts one copy of a duplicated document in train and another in
    * test. A scan-stage projection: no shuffle, no RNG state, identical
    * assignment on any partition layout and any re-run (rows added later
    * join the same split as their group), and the replayable md5 uniform
    * ([[hashUniform]]) lets any engine audit the assignment. Cumulative
    * bounds are accumulated in BigDecimal so `0.8 + 0.1` is the literal
    * `0.9` in every engine, not double drift. Fractions must sum to 1.
    */
  def assignSplit(df: DataFrame, groupCol: String,
      fractions: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "split fractions must be positive")
    require((fractions.map(f => BigDecimal.valueOf(f._2)).sum - 1).abs < BigDecimal("1e-9"),
      "split fractions must sum to 1")
    val u = hashUniform(col(groupCol))
    val bounds = fractions.map(f => BigDecimal.valueOf(f._2))
      .scanLeft(BigDecimal(0))(_ + _).tail.map(_.toDouble)
    val assigned = fractions.zip(bounds).init
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), ub), acc) =>
        when(u < lit(ub), lit(name)).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }

  def mixByTokenBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, budgets: Map[String, Long]): DataFrame = {
    val b: Column = budgets.foldLeft(lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("_budget", b)
      .withColumn("_cum", sum(col(tokensCol)).over(w) - col(tokensCol))
      .filter(col("_budget").isNotNull && col("_cum") < col("_budget"))
      .drop("_budget", "_cum")
  }
}
