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
