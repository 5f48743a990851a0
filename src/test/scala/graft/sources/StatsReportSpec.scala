package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.weblog.IcebergLikeTable

/** Manifest-resolved statistics reporting: the planner sees the true
  * (pruning-aware) bytes/rows of a graft scan, so a small side
  * auto-broadcasts — no `broadcast()` hint in user code.
  */
class StatsReportSpec extends SparkTestBase {

  /** Deep-collect across AQE query-stage boundaries (plain `collect`
    * stops at QueryStageExec leaves).
    */
  private def deep(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(deep)) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deep(a.executedPlan)
      case _ => Nil
    })

  test("catalog joins: the INITIAL plan broadcasts the small graft side (native V2 statistics)") {
    val wh = Files.createTempDirectory("stat_wh").toString
    spark.conf.set("spark.sql.catalog.gstat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstat.web")
    spark.sql("CREATE TABLE gstat.web.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO gstat.web.dim SELECT id, concat('n', id) FROM range(50)")
    // the big side must NOT be broadcastable itself, so the only route
    // to a broadcast join is the graft side's true size. The native V2
    // scan reports manifest-resolved statistics
    // (SupportsReportStatistics), so join selection picks the
    // broadcast build side in the INITIAL plan — no AQE re-plan needed
    // (the V1-bridge era relied on AQE's materialized stage size).
    val big = spark.range(3000000).select(col("id").as("k"),
      lpad(col("id").cast("string"), 64, "x").as("pad"))
    val joined = big.join(spark.table("gstat.web.dim"), "k")
    val initial = joined.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
    }
    assert(initial.nonEmpty,
      s"INITIAL plan must broadcast the 50-row graft side:\n" +
        s"${joined.queryExecution.sparkPlan}")
    joined.collect()
    val bhj = deep(joined.queryExecution.executedPlan).collect {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"executed plan must keep the broadcast:\n" +
        s"${joined.queryExecution.executedPlan}")
    assert(joined.count() == 50)
  }

  test("format(\"graft\") relations report manifest size for join planning") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stat_fmt").toString + "/t", "event")
    t.append((0 until 40).map(i => (i.toLong, "e")).toDF("k", "event"))
    val dim = spark.read.format("graft").option("path", t.path).load()
    val big = spark.range(200000).select(col("id").as("k"))
    val joined = big.join(dim, "k")
    // the RELATION path reports manifest bytes at the LOGICAL level —
    // the graft side must be the build side in the INITIAL plan (no
    // AQE needed), proving sizeInBytes flows from the manifest
    val initial = joined.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
    }
    assert(initial.nonEmpty &&
      initial.head.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight,
      s"40-row graft relation must be the initial build side:\n" +
        s"${joined.queryExecution.sparkPlan}")
    assert(joined.count() == 40)
  }

  test("column NDV/null-count stamps surface as V2 column statistics for the CBO") {
    val wh = Files.createTempDirectory("ndv_wh").toString
    spark.conf.set("spark.sql.catalog.gndv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gndv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gndv.web")
    spark.sql("""CREATE TABLE gndv.web.stamped (k BIGINT, pad STRING)
                |TBLPROPERTIES (statsColumns 'k')""".stripMargin)
    // two commits so the stats must MERGE across files (mergeable HLL,
    // not a per-file count); ~25% of k is NULL so the null count is
    // non-trivial
    for (half <- 0 to 1)
      spark.sql(s"""INSERT INTO gndv.web.stamped
                   |SELECT CASE WHEN id % 4 = 0 THEN NULL ELSE id END,
                   |       md5(CAST(id AS STRING))
                   |FROM range(${half * 10000}, ${(half + 1) * 10000})""".stripMargin)
    val old = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rel = spark.table("gndv.web.stamped")
      val stats = rel.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(20000)))
      val kStat = stats.attributeStats.find(_._1.name == "k")
        .map(_._2).getOrElse(fail(
          s"CBO must see column statistics for k: ${stats.attributeStats}"))
      // 15000 distinct non-null values; HLL@lgK12 ≈ 1.6% error
      val ndv = kStat.distinctCount.getOrElse(fail("no distinctCount")).toLong
      assert(math.abs(ndv - 15000L) < 1000L, s"NDV estimate off: $ndv")
      assert(kStat.nullCount.map(_.toLong).contains(5000L),
        s"null count must be exact: ${kStat.nullCount}")
      // an unstamped column reports nothing (refusal, never a guess)
      assert(!stats.attributeStats.exists(_._1.name == "pad"))
    } finally old.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
  }

  test("NDV decode cost is memoized: a second plan of the same snapshot decodes no sketches (r12)") {
    val wh = Files.createTempDirectory("ndvmemo_wh").toString
    spark.conf.set("spark.sql.catalog.gnm2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gnm2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnm2.web")
    spark.sql("""CREATE TABLE gnm2.web.memo (k BIGINT, v BIGINT)
                |TBLPROPERTIES (statsColumns 'k,v')""".stripMargin)
    for (_ <- 0 until 3)
      spark.sql("INSERT INTO gnm2.web.memo SELECT id, id * 2 FROM range(5000)")
    val old = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def plan(): Unit = {
        // force a FRESH scan + estimateStatistics (new plan, not a
        // cached DataFrame)
        val s = spark.table("gnm2.web.memo")
          .filter(col("k") >= 0).groupBy().count()
        s.queryExecution.optimizedPlan.stats
        ()
      }
      plan() // warm: decodes each (file, column) stamp once at most
      val after1 = graft.weblog.GraftNativeScan.sketchDecodes
      plan()
      plan()
      val after3 = graft.weblog.GraftNativeScan.sketchDecodes
      assert(after3 == after1,
        s"re-planning the same snapshot must decode no sketches " +
          s"(decodes went $after1 -> $after3)")
      // a NEW commit adds new files: only THEIR stamps decode
      spark.sql("INSERT INTO gnm2.web.memo SELECT id, id * 2 FROM range(100)")
      plan()
      val after4 = graft.weblog.GraftNativeScan.sketchDecodes
      assert(after4 > after3, "new files' stamps must decode once")
      plan()
      assert(graft.weblog.GraftNativeScan.sketchDecodes == after4,
        "and only once")
    } finally old.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
  }

  test("NDV flips a downstream broadcast decision (CBO join-output cardinality)") {
    val wh = Files.createTempDirectory("ndvflip_wh").toString
    spark.conf.set("spark.sql.catalog.gnf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gnf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnf.web")
    // the stamped and unstamped twins hold IDENTICAL data: a wide fact
    // (20k rows, k unique) and a selective dim (200 rows). The join
    // output is tiny (200 rows) — but only column NDV can tell the
    // planner that; without it the join estimate falls back to the
    // size product and the SECOND join cannot broadcast the first's
    // result in the initial plan.
    for (suffix <- Seq("s", "n")) {
      val props = if (suffix == "s") "TBLPROPERTIES (statsColumns 'k')" else ""
      spark.sql(s"""CREATE TABLE gnf.web.fact_$suffix (k BIGINT, pad STRING)
                   |$props""".stripMargin)
      spark.sql(s"""INSERT INTO gnf.web.fact_$suffix
                   |SELECT id, concat(md5(CAST(id AS STRING)),
                   |                  md5(CAST(id + 1 AS STRING)))
                   |FROM range(20000)""".stripMargin)
      spark.sql(s"""CREATE TABLE gnf.web.dim_$suffix (k BIGINT, tag STRING)
                   |$props""".stripMargin)
      spark.sql(s"""INSERT INTO gnf.web.dim_$suffix
                   |SELECT id * 100, concat('t', id) FROM range(200)""".stripMargin)
    }
    val big = spark.range(2000000).select(col("id").as("k"),
      lpad(col("id").cast("string"), 64, "y").as("bp"))
    big.createOrReplaceTempView("graft_ndv_big")
    val olds = Seq("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // above the 200-row dim and the tiny join output, below the fact
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)
    try {
      // the DECISION INPUT: the CBO's size estimate of (fact ⋈ dim) —
      // what join selection compares against the broadcast threshold.
      // NDV + range stats see the true ~200-row output; without them
      // the estimate falls back to the row-count product.
      def joinEstimate(suffix: String): BigInt = spark.sql(
        s"""SELECT f.k, d.tag FROM gnf.web.fact_$suffix f
           |JOIN gnf.web.dim_$suffix d ON f.k = d.k""".stripMargin)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val threshold = BigInt(512 * 1024)
      val stamped = joinEstimate("s")
      val unstamped = joinEstimate("n")
      assert(stamped < threshold && unstamped > threshold,
        s"NDV must flip the broadcast decision input: stamped=$stamped " +
          s"unstamped=$unstamped threshold=$threshold")
      assert(unstamped / stamped > 100,
        s"estimates barely differ: $stamped vs $unstamped")
      // and the physical consequence: with the stamps, the INITIAL plan
      // broadcasts the (fact ⋈ dim) RESULT into the big side — a
      // BroadcastHashJoin whose build subtree itself contains a join
      def broadcastsJoinOutput(suffix: String): Boolean = {
        val q = spark.sql(
          s"""SELECT count(*) FROM graft_ndv_big c
             |JOIN (SELECT f.k FROM gnf.web.fact_$suffix f
             |      JOIN gnf.web.dim_$suffix d ON f.k = d.k) j
             |ON c.k = j.k""".stripMargin)
        q.queryExecution.sparkPlan.collect {
          case b: BroadcastHashJoinExec => b
        }.exists { b =>
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          }
          build.collect {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
          }.nonEmpty
        }
      }
      assert(broadcastsJoinOutput("s"),
        "with NDV the tiny join output must be the broadcast build side")
      assert(!broadcastsJoinOutput("n"),
        "without NDV the product-estimated join output must NOT broadcast")
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("live tombstones demote, not erase, column statistics: ranges survive (r13)") {
    val wh = Files.createTempDirectory("gbnd_wh").toString
    spark.conf.set("spark.sql.catalog.gbnd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbnd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbnd.web")
    spark.sql("""CREATE TABLE gbnd.web.fact (k BIGINT, pad STRING)
                |TBLPROPERTIES (statsColumns 'k',
                |'write.delete.mode' 'merge-on-read')""".stripMargin)
    spark.sql("""INSERT INTO gbnd.web.fact
                |SELECT id, md5(CAST(id AS STRING)) FROM range(20000)""".stripMargin)
    // a key-less MOR DELETE writes POSITIONAL tombstones; the snapshot
    // then carries live delete files and still reads natively
    spark.sql("DELETE FROM gbnd.web.fact WHERE k >= 19000")
    val old = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("gbnd.web.fact")
        .queryExecution.optimizedPlan.stats
      val kStat = stats.attributeStats.find(_._1.name == "k").map(_._2)
        .getOrElse(fail(
          s"range statistics must survive live tombstones (deletion " +
            s"cannot widen a range): ${stats.attributeStats}"))
      // exact-or-wider bounds stay; NDV and null counts are only UPPER
      // bounds under masking and the V2 contract has no bound flag —
      // withheld (refusal, never a guess)
      assert(kStat.min.contains(0L) && kStat.max.contains(19999L),
        s"stamped bounds must surface: min=${kStat.min} max=${kStat.max}")
      assert(kStat.distinctCount.isEmpty,
        s"NDV must withhold under masking: ${kStat.distinctCount}")
      assert(kStat.nullCount.isEmpty,
        s"null count must withhold under masking: ${kStat.nullCount}")
    } finally old.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
    // the broadcast decision is unchanged: a tombstoned 50-row dim
    // still broadcasts in the INITIAL plan (manifest size reporting
    // never depended on the withheld counts)
    spark.sql("""CREATE TABLE gbnd.web.dim (k BIGINT, name STRING)
                |TBLPROPERTIES ('write.delete.mode' 'merge-on-read')""".stripMargin)
    spark.sql("INSERT INTO gbnd.web.dim SELECT id, concat('n', id) FROM range(60)")
    spark.sql("DELETE FROM gbnd.web.dim WHERE k >= 50")
    val big = spark.range(3000000).select(col("id").as("k"),
      lpad(col("id").cast("string"), 64, "x").as("pad"))
    val joined = big.join(spark.table("gbnd.web.dim"), "k")
    assert(joined.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty,
      s"tombstoned dim must still broadcast:\n" +
        s"${joined.queryExecution.sparkPlan}")
    assert(joined.count() == 50)
  }

  test("a provably tiny tombstone keeps NDV as an upper bound; a large one withholds (r14)") {
    val wh = Files.createTempDirectory("gtiny_wh").toString
    spark.conf.set("spark.sql.catalog.gtiny", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtiny.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtiny.web")
    spark.sql("""CREATE TABLE gtiny.web.fact (k BIGINT, pad STRING)
                |TBLPROPERTIES (statsColumns 'k',
                |'write.delete.mode' 'merge-on-read')""".stripMargin)
    spark.sql("""INSERT INTO gtiny.web.fact
                |SELECT id, md5(CAST(id AS STRING)) FROM range(20000)""".stripMargin)
    // a GDPR-sized tombstone: 50 of 20000 rows = 0.25% — the manifest
    // stamps both sides, so the masked fraction is provably under the
    // 1% ε and the masking bias sits below the HLL sketch's own ~1.6%
    // standard error
    spark.sql("DELETE FROM gtiny.web.fact WHERE k >= 19950")
    val old = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("gtiny.web.fact")
        .queryExecution.optimizedPlan.stats
      val kStat = stats.attributeStats.find(_._1.name == "k").map(_._2)
        .getOrElse(fail(s"stats must surface: ${stats.attributeStats}"))
      assert(kStat.min.contains(0L) && kStat.max.contains(19999L))
      // NDV survives as an upper bound: the stamped estimate covers
      // all 20000 pre-masking keys, within sketch error of the 19950
      // live ones — and NEVER an underestimate of the stamps
      assert(kStat.distinctCount.isDefined,
        "a sub-ε tombstone must keep the NDV upper bound")
      val ndv = kStat.distinctCount.get.toLong
      assert(ndv >= 19000L && ndv <= 21000L,
        s"NDV bound must stay within sketch error of the stamps: $ndv")
      assert(kStat.nullCount.isDefined && kStat.nullCount.get.toLong == 0L,
        s"null count must surface as a bound too: ${kStat.nullCount}")
    } finally old.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
      spark.conf.set("spark.sql.cbo.enabled", _))
    // the contrast case lives in the r13 test above: a 5% tombstone on
    // the same table shape still withholds NDV/null counts
  }

  test("statistics are PRUNING-aware: a filtered scan reports the pruned bytes") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("stat_pr").toString + "/t", "day")
    for (day <- 1 to 5)
      t.append((0 until 100).map(i => (i.toLong, day)).toDF("k", "day"))
    val (allB, allR) = t.scanStatsFor(lit(true))
    val (oneB, oneR) = t.scanStatsFor(col("day") === 3)
    assert(allR.contains(500L) && oneR.contains(100L))
    assert(oneB.exists(_ > 0) && allB.exists(b => oneB.get < b),
      s"pruned stats must shrink: $oneB vs $allB")
    assert(t.dataBytesEstimate == allB)
  }
}
