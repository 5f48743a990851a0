package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.weblog.{GraftNativeScan, IcebergLikeTable}

/** The native DataSource-V2 batch read path over catalog tables:
  * vectorized-parquet scans planned from the manifest, plan-time
  * statistics (the INITIAL plan picks the broadcast side — no AQE
  * needed), and runtime join-driven file pruning (Trino-style dynamic
  * filtering through SupportsRuntimeV2Filtering). Fallback legs pin
  * that ineligible snapshots (live delete files, rename epochs) still
  * read correctly through the V1 bridge.
  */
class NativeScanSpec extends SparkTestBase {

  private lazy val warehouse = Files.createTempDirectory("native_scan").toString

  private def sql(q: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gns", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gns.warehouse", warehouse)
    spark.sql(q)
  }

  /** BatchScanExec nodes of the FINAL physical plan — descends into
    * the AQE-executed subtree AND its query stages (both hide their
    * children from a plain `collect`).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case _ => Nil
    })

  private def batchScans(df: DataFrame): Seq[BatchScanExec] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
  }

  test("catalog reads plan a native BatchScan with pushdown; results match the V1 semantics") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.ev (uid BIGINT, event STRING, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    for (d <- 1 to 4)
      sql(s"INSERT INTO gns.web.ev SELECT id, concat('e', id % 3), $d FROM range(100)")
    val q = sql("SELECT event, count(*) AS cnt FROM gns.web.ev WHERE day = 2 GROUP BY event")
    assert(batchScans(q).nonEmpty, "eligible snapshot must take the native V2 scan")
    assert(q.collect().map(_.getLong(1)).sum == 100L)
    // partition pruning happened at planning: only day=2 files scheduled
    val t = IcebergLikeTable(spark, s"$warehouse/web/ev", "day")
    GraftNativeScan.clearPrune(t.path)
    sql("SELECT count(*) FROM gns.web.ev WHERE day = 2").collect()
    val (static0, _) = GraftNativeScan.lastPrune(t.path).get
    assert(static0 < t.filesFor(lit(true)).size && static0 > 0,
      s"day=2 scan planned $static0 files of ${t.filesFor(lit(true)).size}")
    // stats-column pruning also reaches the native planning
    GraftNativeScan.clearPrune(t.path)
    assert(sql("SELECT count(*) FROM gns.web.ev WHERE uid = 1").head.getLong(0) == 4L)
    // full projection and ORDER round-trips (column order restored by Spark)
    val row = sql("SELECT uid, event, day FROM gns.web.ev WHERE day = 1 AND uid = 5").head
    assert((row.getLong(0), row.getString(1), row.getInt(2)) == ((5L, "e2", 1)))
  }

  test("plan-time statistics: the INITIAL plan broadcasts the small graft table (no AQE re-plan needed)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("CREATE TABLE gns.web.smalldim (day INT, tag STRING)")
    sql("INSERT INTO gns.web.smalldim SELECT id, concat('t', id) FROM range(30)")
    sql("""CREATE TABLE gns.web.bigfact (uid BIGINT, day INT)
          |PARTITIONED BY (day)""".stripMargin)
    for (d <- 1 to 6)
      sql(s"INSERT INTO gns.web.bigfact SELECT id, $d FROM range(2000)")
    val q = sql("""SELECT f.day, count(*) AS cnt
                  |FROM gns.web.bigfact f JOIN gns.web.smalldim d ON f.day = d.day
                  |GROUP BY f.day""".stripMargin)
    // the INITIAL spark plan (pre-AQE) must already pick a broadcast
    // join — V2 statistics feed join selection, the V1ScanWrapper gap
    val initial = q.queryExecution.sparkPlan
    val bhj = initial.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"initial plan must broadcast the small graft side:\n$initial")
    assert(q.collect().map(_.getLong(1)).sum == 12000L)
  }

  test("runtime join-driven file pruning: a dim-only filter prunes fact files through the join") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.fact (uid BIGINT, day INT)
          |PARTITIONED BY (day)""".stripMargin)
    for (d <- 1 to 8)
      sql(s"INSERT INTO gns.web.fact SELECT id, $d FROM range(500)")
    sql("CREATE TABLE gns.web.dim (day INT, tag STRING)")
    sql("INSERT INTO gns.web.dim VALUES (1,'a'),(2,'a'),(3,'HOT'),(4,'a'),(5,'a'),(6,'a'),(7,'a'),(8,'a')")
    val t = IcebergLikeTable(spark, s"$warehouse/web/fact", "day")
    val total = t.filesFor(lit(true)).size
    GraftNativeScan.clearPrune(t.path)
    val res = sql("""SELECT count(*) FROM gns.web.fact f
                    |JOIN gns.web.dim d ON f.day = d.day
                    |WHERE d.tag = 'HOT'""".stripMargin)
    assert(res.head.getLong(0) == 500L)
    val (_, runtime) = GraftNativeScan.lastPrune(t.path)
      .getOrElse(fail("native scan did not plan"))
    assert(runtime >= 0, "dynamic pruning must have re-planned the fact scan")
    assert(runtime < total && runtime > 0,
      s"join-driven pruning must cut the fact file set: $runtime of $total")
  }

  test("fallback: live MOR deletes and rename epochs read through the V1 bridge, correctly") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.mor (uid BIGINT, n BIGINT)
          |TBLPROPERTIES ('write.delete.mode' 'merge-on-read')""".stripMargin)
    sql("INSERT INTO gns.web.mor SELECT id, id * 10 FROM range(20)")
    sql("DELETE FROM gns.web.mor WHERE uid >= 15")
    // live positional delete files → ineligible → V1 bridge (no BatchScan)
    val q = sql("SELECT count(*) FROM gns.web.mor")
    assert(batchScans(q).isEmpty, "MOR snapshot must fall back to the V1 bridge")
    assert(q.head.getLong(0) == 15L)
    // rename epoch → ineligible, still correct
    sql("CREATE TABLE gns.web.ren (a STRING, b BIGINT)")
    sql("INSERT INTO gns.web.ren VALUES ('x', 1)")
    sql("ALTER TABLE gns.web.ren RENAME COLUMN b TO n")
    sql("INSERT INTO gns.web.ren VALUES ('y', 2)")
    val r = sql("SELECT sum(n) FROM gns.web.ren")
    assert(batchScans(r).isEmpty, "rename epochs must fall back to the V1 bridge")
    assert(r.head.getLong(0) == 3L)
  }

  test("aggregate pushdown: whole-table COUNT/MIN/MAX answer from the manifest, zero tasks") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.agg (uid BIGINT, name STRING, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'uid,name')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"INSERT INTO gns.web.agg SELECT id + ${d * 1000}, concat('n', id), $d FROM range(50)")
    val q = sql("SELECT count(*), min(uid), max(uid), max(name) FROM gns.web.agg")
    val row = q.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3)) ==
      ((150L, 1000L, 3049L, "n9")))
    // the plan is a LOCAL scan — no BatchScan, no file tasks
    assert(batchScans(q).isEmpty, "manifest aggregate must not scan files")
    assert(allNodes(q.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      s"expected LocalTableScan:\n${q.queryExecution.executedPlan}")
    // an unstamped column refuses the pushdown but still answers
    val q2 = sql("SELECT min(day) FROM gns.web.agg")
    assert(q2.head.getInt(0) == 1)
    // filters force the real scan (residual re-filtering is row-level)
    val q3 = sql("SELECT count(*) FROM gns.web.agg WHERE day = 2")
    assert(q3.head.getLong(0) == 50L)
    assert(batchScans(q3).nonEmpty, "filtered aggregates must scan")
    // live MOR deletes make the count metadata-undecidable: fall back
    sql("""CREATE TABLE gns.web.aggmor (uid BIGINT, n BIGINT)
          |TBLPROPERTIES ('write.delete.mode' 'merge-on-read')""".stripMargin)
    sql("INSERT INTO gns.web.aggmor SELECT id, id FROM range(30)")
    sql("DELETE FROM gns.web.aggmor WHERE uid >= 20")
    val q4 = sql("SELECT count(*) FROM gns.web.aggmor")
    assert(q4.head.getLong(0) == 20L)
    // empty table: COUNT(*) = 0 from metadata, MIN refuses (no bounds)
    sql("CREATE TABLE gns.web.aggempty (x BIGINT)")
    assert(sql("SELECT count(*) FROM gns.web.aggempty").head.getLong(0) == 0L)
    assert(sql("SELECT min(x) FROM gns.web.aggempty").head.isNullAt(0))
  }

  test("grouped aggregate pushdown: GROUP BY partition column answers per leaf, zero tasks") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.gagg (uid BIGINT, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"INSERT INTO gns.web.gagg SELECT id + ${d * 1000}, $d FROM range(40)")
    val q = sql("""SELECT day, count(*) AS c, min(uid) AS lo, max(uid) AS hi
                  |FROM gns.web.gagg GROUP BY day ORDER BY day""".stripMargin)
    val rows = q.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq((1, 40L, 1000L, 1039L), (2, 40L, 2000L, 2039L),
      (3, 40L, 3000L, 3039L)))
    assert(batchScans(q).isEmpty, "grouped manifest aggregate must not scan files")
    assert(allNodes(q.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      s"expected LocalTableScan:\n${q.queryExecution.executedPlan}")
    // grouping by a NON-partition column falls back to a real scan
    val q2 = sql("SELECT uid % 2, count(*) FROM gns.web.gagg GROUP BY uid % 2")
    assert(q2.collect().map(_.getLong(1)).sum == 120L)
    // keyed tables merge their bucket leaves per partition value
    sql("""CREATE TABLE gns.web.gaggk (id BIGINT, day INT, seq BIGINT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq')""".stripMargin)
    sql("INSERT INTO gns.web.gaggk SELECT id, CAST(id % 2 AS INT), 1 FROM range(50)")
    val k = sql("SELECT day, count(*) AS c FROM gns.web.gaggk GROUP BY day ORDER BY day")
    assert(k.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 25L), (1, 25L)))
    assert(batchScans(k).isEmpty)
  }

  test("limit pushdown: LIMIT opens only covering files (stamped row counts)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.lim (uid BIGINT, day INT)
          |PARTITIONED BY (day)""".stripMargin)
    for (d <- 1 to 4)
      sql(s"INSERT INTO gns.web.lim SELECT id, $d FROM range(100)")
    val t = IcebergLikeTable(spark, s"$warehouse/web/lim", "day")
    val total = t.filesFor(lit(true)).size
    assert(total >= 4)
    GraftNativeScan.clearPrune(t.path)
    val rows = sql("SELECT * FROM gns.web.lim LIMIT 5").collect()
    assert(rows.length == 5)
    val (planned, _) = GraftNativeScan.lastPrune(t.path)
      .getOrElse(fail("native scan did not plan"))
    assert(planned < total && planned >= 1,
      s"LIMIT 5 must open a file subset: planned $planned of $total")
    // a filtered LIMIT is NOT file-truncated (filters are residual) —
    // rows stay correct
    val f = sql("SELECT * FROM gns.web.lim WHERE uid = 99 LIMIT 10").collect()
    assert(f.length == 4)
  }

  test("time travel reads natively against the pinned snapshot") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("CREATE TABLE gns.web.tt (n BIGINT)")
    sql("INSERT INTO gns.web.tt VALUES (1)")
    sql("INSERT INTO gns.web.tt VALUES (2)")
    val q = sql("SELECT count(*) FROM gns.web.tt VERSION AS OF 1")
    assert(batchScans(q).nonEmpty)
    assert(q.head.getLong(0) == 1L)
    assert(sql("SELECT count(*) FROM gns.web.tt").head.getLong(0) == 2L)
  }
}
