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
    // a row query (a filtered count(*) is now a metadata lookup that
    // never plans the scan)
    sql("SELECT uid FROM gns.web.ev WHERE day = 2").collect()
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
    // runtime pruning COMPOSES with live equality deletes (r11): the
    // keyed MOR fact keeps dynamic filtering — Trino's posture — and
    // the surviving files' readers still mask the tombstoned keys
    sql("""CREATE TABLE gns.web.factm (uid BIGINT, day INT, seq BIGINT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (uniqueKeys 'uid', numBuckets '2', orderCol 'seq',
          |'write.delete.mode' 'merge-on-read')""".stripMargin)
    for (d <- 1 to 8)
      sql(s"INSERT INTO gns.web.factm SELECT id + $d * 10000, $d, 1 FROM range(500)")
    sql("DELETE FROM gns.web.factm WHERE uid % 10 = 3")
    val tm = IcebergLikeTable(spark, s"$warehouse/web/factm", "day",
      uniqueKeys = Seq("uid"), numBuckets = 2)
    val totalM = tm.filesFor(lit(true)).size
    GraftNativeScan.clearPrune(tm.path)
    val resM = sql("""SELECT count(*) FROM gns.web.factm f
                     |JOIN gns.web.dim d ON f.day = d.day
                     |WHERE d.tag = 'HOT'""".stripMargin)
    assert(resM.head.getLong(0) == 450L,
      "the mask must drop the tombstoned keys from the pruned read")
    val (_, runtimeM) = GraftNativeScan.lastPrune(tm.path)
      .getOrElse(fail("native scan did not plan the MOR fact"))
    assert(runtimeM >= 0 && runtimeM < totalM && runtimeM > 0,
      s"dynamic pruning must survive eq deletes: $runtimeM of $totalM")
  }

  test("positional MOR deletes, rename epochs AND equality deletes read NATIVELY (r11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.mor (uid BIGINT, n BIGINT)
          |TBLPROPERTIES ('write.delete.mode' 'merge-on-read')""".stripMargin)
    sql("INSERT INTO gns.web.mor SELECT id, id * 10 FROM range(20)")
    sql("DELETE FROM gns.web.mor WHERE uid >= 15")
    // live POSITIONAL delete files now read through the native scan:
    // the reader skips the stamped (file, ordinal) tuples in place
    val q = sql("SELECT count(*) FROM gns.web.mor")
    assert(batchScans(q).nonEmpty,
      "positional-delete snapshot must take the native V2 scan")
    assert(q.head.getLong(0) == 15L)
    assert(sql("SELECT sum(n) FROM gns.web.mor").head.getLong(0) ==
      (0 until 15).map(_ * 10L).sum)
    // a second delete generation composes
    sql("DELETE FROM gns.web.mor WHERE uid < 3")
    val q2 = sql("SELECT uid FROM gns.web.mor ORDER BY uid")
    assert(batchScans(q2).nonEmpty)
    assert(q2.collect().map(_.getLong(0)).toSeq == (3L until 15L))
    // rename epochs read natively through per-epoch reader schemas
    sql("CREATE TABLE gns.web.ren (a STRING, b BIGINT)")
    sql("INSERT INTO gns.web.ren VALUES ('x', 1)")
    sql("ALTER TABLE gns.web.ren RENAME COLUMN b TO n")
    sql("INSERT INTO gns.web.ren VALUES ('y', 2)")
    val r = sql("SELECT sum(n) FROM gns.web.ren")
    assert(batchScans(r).nonEmpty, "rename epochs must read natively")
    assert(r.head.getLong(0) == 3L)
    // old-epoch rows resolve the renamed column through its physical
    // name; the filter prunes and re-applies correctly on both epochs
    val r2 = sql("SELECT a, n FROM gns.web.ren WHERE n = 1")
    assert(batchScans(r2).nonEmpty)
    assert(r2.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("x", 1L)))
    // EQUALITY deletes (keyed GDPR merge-on-read) read natively too
    // (r11): each reader masks the out-sequencing generations' key
    // tuples in place — the count(*) below must NOT see deleted keys,
    // and the unrequested key column is read-and-dropped internally
    sql("""CREATE TABLE gns.web.eqdel (id BIGINT, v BIGINT, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'id', numBuckets '2', orderCol 'seq',
          |'write.delete.mode' 'merge-on-read')""".stripMargin)
    sql("INSERT INTO gns.web.eqdel SELECT id, id, 1 FROM range(10)")
    sql("DELETE FROM gns.web.eqdel WHERE id >= 7")
    val e = sql("SELECT count(*) FROM gns.web.eqdel")
    assert(batchScans(e).nonEmpty,
      "equality-delete snapshot must take the native V2 scan")
    assert(e.head.getLong(0) == 7L)
    // a projection WITHOUT the key column still masks correctly (the
    // reader reads the key as a helper column and projects it out)
    val ev = sql("SELECT v FROM gns.web.eqdel ORDER BY v")
    assert(batchScans(ev).nonEmpty)
    assert(ev.collect().map(_.getLong(0)).toSeq == (0L until 7L))
    // SEQUENCE SCOPING: a row re-inserted under the SAME key AFTER the
    // delete out-sequences the tombstone and must survive the mask
    sql("INSERT INTO gns.web.eqdel SELECT id, id + 100, 2 FROM range(8, 9)")
    val re = sql("SELECT id, v FROM gns.web.eqdel WHERE id >= 7")
    assert(batchScans(re).nonEmpty)
    assert(re.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((8L, 108L)))
    // a SECOND equality generation out-sequences the re-inserted file:
    // generations compose, each masking only the files below it
    sql("DELETE FROM gns.web.eqdel WHERE id = 8")
    val both = sql("SELECT count(*) FROM gns.web.eqdel")
    assert(batchScans(both).nonEmpty)
    assert(both.head.getLong(0) == 7L)
    // parity: the census equals the V1 direct-API read row for row
    assert(sql("SELECT sum(v) FROM gns.web.eqdel").head.getLong(0) ==
      (0L until 7L).sum)
    // NULL keys mask null-safely (the V1 anti-join is <=>; the native
    // probe's UnsafeRow null bit is one fixed pattern — same answer)
    sql("INSERT INTO gns.web.eqdel SELECT NULL, 999, 3 FROM range(1)")
    assert(sql("SELECT count(*) FROM gns.web.eqdel").head.getLong(0) == 8L)
    sql("DELETE FROM gns.web.eqdel WHERE v = 999")
    val n = sql("SELECT count(*) FROM gns.web.eqdel")
    assert(batchScans(n).nonEmpty)
    assert(n.head.getLong(0) == 7L,
      "a null-key tombstone must mask exactly the null-key row")
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
    // a PARTITION-column filter no longer forces the scan: the filter
    // is handled exactly at the leaf level, so the count stays a
    // zero-task manifest lookup (see the dedicated filtered-agg test)
    val q3 = sql("SELECT count(*) FROM gns.web.agg WHERE day = 2")
    assert(q3.head.getLong(0) == 50L)
    assert(batchScans(q3).isEmpty,
      "partition-filtered count must answer from the manifest")
    // a DATA-column filter is residual and forces the real scan
    val q3b = sql("SELECT count(*) FROM gns.web.agg WHERE uid >= 2000")
    assert(q3b.head.getLong(0) == 100L)
    assert(batchScans(q3b).nonEmpty, "data-filtered aggregates must scan")
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

  test("COUNT(col) pushdown: non-null counts answer from stamped null counts, zero tasks (r11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    sql("""CREATE TABLE gns.web.cnn (uid BIGINT, name STRING, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'uid,name')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"""INSERT INTO gns.web.cnn
             |SELECT id, IF(id % 4 = 0, NULL, concat('n', id)), $d
             |FROM range(40)""".stripMargin)
    // whole-table: count(name) skips the nulls, count(uid) counts all
    val q = sql("""SELECT count(name) AS cn, count(uid) AS cu,
                  |count(*) AS ca FROM gns.web.cnn""".stripMargin)
    assert(zeroTask(q), s"COUNT(col) must answer from the manifest:\n" +
      s"${q.queryExecution.executedPlan}")
    assert(q.head() == org.apache.spark.sql.Row(90L, 120L, 120L))
    // grouped by the partition column
    val qg = sql("""SELECT day, count(name) AS cn FROM gns.web.cnn
                   |GROUP BY day ORDER BY day""".stripMargin)
    assert(zeroTask(qg))
    assert(qg.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 30L), (2, 30L), (3, 30L)))
    // filtered by a handled partition predicate
    val qf = sql("SELECT count(name) AS cn FROM gns.web.cnn WHERE day = 2")
    assert(zeroTask(qf))
    assert(qf.head.getLong(0) == 30L)
    // a column OUTSIDE statsColumns has no null stamp — real scan,
    // same answer
    sql("""CREATE TABLE gns.web.cnu (uid BIGINT, name STRING)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    sql("""INSERT INTO gns.web.cnu
          |SELECT id, IF(id % 2 = 0, NULL, 'x') FROM range(10)""".stripMargin)
    val qu = sql("SELECT count(name) AS cn FROM gns.web.cnu")
    qu.collect()
    assert(batchScans(qu).nonEmpty,
      "an unstamped column's COUNT must fall back to a real scan")
    assert(qu.head.getLong(0) == 5L)
    // COUNT(DISTINCT col) is never metadata-decidable
    val qd = sql("SELECT count(DISTINCT name) AS cd FROM gns.web.cnn")
    qd.collect()
    assert(batchScans(qd).nonEmpty)
    // the same 30 non-null names repeat in every day partition
    assert(qd.head.getLong(0) == 30L)
  }

  test("timestamp/date stats stamp as epoch micros/days: freshness min/max push, ranges prune (r11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // a NON-partition timestamp column in statsColumns (identity day
    // partitioning): the freshness query answers from the manifest
    sql("""CREATE TABLE gns.web.ts (uid BIGINT, ev_ts TIMESTAMP,
          |ev_d DATE, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'ev_ts,ev_d')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"""INSERT INTO gns.web.ts
             |SELECT id, timestamp'2024-03-0$d 06:00:00' +
             |  make_interval(0, 0, 0, 0, 0, CAST(id AS INT), 0),
             |  date'2024-03-0$d', $d
             |FROM range(30)""".stripMargin)
    val q = sql("""SELECT min(ev_ts) AS lo, max(ev_ts) AS hi,
                  |       min(ev_d) AS dlo, max(ev_d) AS dhi
                  |FROM gns.web.ts""".stripMargin)
    assert(zeroTask(q), s"min/max over a stamped timestamp column must " +
      s"answer from the manifest:\n${q.queryExecution.executedPlan}")
    val r = q.head()
    assert(r.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-03-01 06:00:00"))
    assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-03-03 06:29:00"))
    assert(r.getDate(2) == java.sql.Date.valueOf("2024-03-01"))
    assert(r.getDate(3) == java.sql.Date.valueOf("2024-03-03"))
    // a time-range predicate on the DATA timestamp column prunes files
    // at planning: only day-2's file can satisfy the interval
    val t = graft.weblog.IcebergLikeTable(spark,
      warehouse + "/web/ts", partitionCol = "day",
      statsColumns = Seq("ev_ts", "ev_d"))
    val total = t.filesFor(lit(true)).size
    val hit = t.filesFor(
      col("ev_ts") >= lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00")) &&
        col("ev_ts") < lit(java.sql.Timestamp.valueOf("2024-03-03 00:00:00"))).size
    assert(hit * 3 == total && hit > 0,
      s"timestamp bounds must prune to day-2's commit (total=$total hit=$hit)")
    val dhit = t.filesFor(col("ev_d") === lit(java.sql.Date.valueOf("2024-03-03"))).size
    assert(dhit * 3 == total,
      s"date bounds must prune to one commit's files (total=$total hit=$dhit)")
    // row-identity through the pruned read
    assert(t.readWhere(col("ev_d") === lit(java.sql.Date.valueOf("2024-03-03")))
      .count() == 30L)
  }

  test("SUM(col) pushdown: exact sums from stamped per-file decimal sums, zero tasks (r11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    sql("""CREATE TABLE gns.web.sm (v BIGINT, w DOUBLE, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'v,w')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"""INSERT INTO gns.web.sm
             |SELECT IF(id % 5 = 0, NULL, id + $d * 100), CAST(id AS DOUBLE), $d
             |FROM range(50)""".stripMargin)
    // whole-table: nulls are skipped, the sum is exact
    val expect = (1 to 3).flatMap(d =>
      (0 until 50).filter(_ % 5 != 0).map(_ + d * 100L)).sum
    val q = sql("SELECT sum(v) AS s, count(*) AS c FROM gns.web.sm")
    assert(zeroTask(q), s"SUM(bigint) must answer from the manifest:\n" +
      s"${q.queryExecution.executedPlan}")
    assert(q.head() == org.apache.spark.sql.Row(expect, 150L))
    // grouped by the partition column
    val qg = sql("SELECT day, sum(v) AS s FROM gns.web.sm GROUP BY day ORDER BY day")
    assert(zeroTask(qg))
    assert(qg.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      (1 to 3).map(d => (d,
        (0 until 50).filter(_ % 5 != 0).map(_ + d * 100L).sum)))
    // filtered by a handled partition predicate
    val qf = sql("SELECT sum(v) AS s FROM gns.web.sm WHERE day = 2")
    assert(zeroTask(qf))
    assert(qf.head.getLong(0) ==
      (0 until 50).filter(_ % 5 != 0).map(_ + 200L).sum)
    // DOUBLE sums are never stamped (order-dependent addition): scan
    val qw = sql("SELECT sum(w) AS s FROM gns.web.sm")
    qw.collect()
    assert(batchScans(qw).nonEmpty,
      "floating-point SUM must fall back to a real scan")
    assert(math.abs(qw.head.getDouble(0) - 3 * (0 until 50).sum.toDouble) < 1e-6)
    // an all-null column sums to NULL (not 0) — SQL SUM semantics
    sql("""CREATE TABLE gns.web.smn (v BIGINT, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'v')""".stripMargin)
    sql("INSERT INTO gns.web.smn SELECT CAST(NULL AS BIGINT), 1 FROM range(5)")
    val qn = sql("SELECT sum(v) AS s FROM gns.web.smn")
    assert(zeroTask(qn))
    assert(qn.head.isNullAt(0), "SUM over only nulls must be NULL")
    // a sum beyond the long range REFUSES — the real scan decides, and
    // under ANSI mode (Spark 4's default) that is Spark's own
    // ARITHMETIC_OVERFLOW error. Answering the exact 38-digit value
    // from metadata would SILENTLY diverge from engine semantics.
    sql("""CREATE TABLE gns.web.smo (v BIGINT)
          |TBLPROPERTIES (statsColumns 'v')""".stripMargin)
    sql(s"INSERT INTO gns.web.smo VALUES (${Long.MaxValue}), (${Long.MaxValue})")
    val qo = sql("SELECT sum(v) AS s FROM gns.web.smo")
    assert(!allNodes(qo.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      "an over-long exact sum must fall back to the real scan")
    val overflow = intercept[Exception] { qo.collect() }
    assert(overflow.getMessage.contains("ARITHMETIC_OVERFLOW"))
  }

  test("extract-grouped metadata aggregates: GROUP BY hour/dayofweek answers from leaves, merged (r11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // hours() layout: 3 days x 4 distinct hours, 2 rows per hour —
    // GROUP BY hour(ts) must MERGE the 12 leaves into 4 groups (the
    // ordinal→hour-of-day mapping is many-to-one across days)
    sql("""CREATE TABLE gns.web.exh (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (hours(ts))
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    sql("""INSERT INTO gns.web.exh
          |SELECT id, timestamp'2024-03-04 00:30:00' +
          |  make_interval(0, 0, 0, CAST(id % 3 AS INT), CAST((id % 8) DIV 2 AS INT) * 5, 0, id % 2)
          |FROM range(24)""".stripMargin)
    val q = sql("""SELECT hour(ts) AS h, count(*) AS c
                  |FROM gns.web.exh GROUP BY hour(ts) ORDER BY h""".stripMargin)
    assert(zeroTask(q),
      s"hour(ts) grouping must be a zero-task manifest lookup:\n" +
        s"${q.queryExecution.executedPlan}")
    assert(q.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 6L), (5, 6L), (10, 6L), (15, 6L)))
    // MINUTE varies WITHIN an hour leaf — must fall back to a real scan
    val qm = sql("SELECT minute(ts) AS m, count(*) AS c FROM gns.web.exh GROUP BY minute(ts)")
    qm.collect()
    assert(batchScans(qm).nonEmpty,
      "minute(ts) is not leaf-constant and must scan for real")
    assert(qm.collect().map(_.getLong(1)).sum == 24L)
    // days() layout: GROUP BY dayofweek + min/max bounds merge across
    // same-weekday leaves; 2024-03-04 is a Monday (Spark dayofweek 2)
    sql("""CREATE TABLE gns.web.exd (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    sql("""INSERT INTO gns.web.exd
          |SELECT id, timestamp'2024-03-04 12:00:00' +
          |  make_interval(0, 0, 0, CAST(id % 9 AS INT), 0, 0, 0)
          |FROM range(90)""".stripMargin)
    val qd = sql("""SELECT dayofweek(ts) AS dw, count(*) AS c,
                   |       min(uid) AS lo, max(uid) AS hi
                   |FROM gns.web.exd GROUP BY dayofweek(ts) ORDER BY dw""".stripMargin)
    assert(zeroTask(qd),
      s"dayofweek grouping must be a zero-task manifest lookup:\n" +
        s"${qd.queryExecution.executedPlan}")
    val got = qd.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // oracle: recompute in Spark itself over the raw range
    val expect = spark.sql(
      """SELECT dayofweek(timestamp'2024-03-04 12:00:00' +
        |  make_interval(0, 0, 0, CAST(id % 9 AS INT), 0, 0, 0)) AS dw,
        |  count(*) AS c, min(id) AS lo, max(id) AS hi
        |FROM range(90) GROUP BY 1 ORDER BY dw""".stripMargin)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // month + year compose with a handled day-aligned time filter
    val qy = sql("""SELECT month(ts) AS m, count(*) AS c FROM gns.web.exd
                   |WHERE ts >= timestamp'2024-03-05 00:00:00'
                   |GROUP BY month(ts) ORDER BY m""".stripMargin)
    assert(zeroTask(qy))
    val expect2 = spark.sql(
      """SELECT month(ts) AS m, count(*) AS c FROM (
        |  SELECT timestamp'2024-03-04 12:00:00' +
        |    make_interval(0, 0, 0, CAST(id % 9 AS INT), 0, 0, 0) AS ts
        |  FROM range(90)) WHERE ts >= timestamp'2024-03-05 00:00:00'
        |GROUP BY 1 ORDER BY m""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(qy.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == expect2)
    // the full date-part field sweep, each recomputed by Spark itself
    // over the raw generator (the spec's oracle)
    for (fn <- Seq("year", "quarter", "day", "dayofyear", "weekofyear",
        "weekday", "dayofweek")) {
      val qf = sql(s"""SELECT $fn(ts) AS g, count(*) AS c
                      |FROM gns.web.exd GROUP BY $fn(ts) ORDER BY g""".stripMargin)
      assert(zeroTask(qf), s"$fn(ts) grouping must be zero-task:\n" +
        s"${qf.queryExecution.executedPlan}")
      val exp = spark.sql(
        s"""SELECT $fn(ts) AS g, count(*) AS c FROM (
           |  SELECT timestamp'2024-03-04 12:00:00' +
           |    make_interval(0, 0, 0, CAST(id % 9 AS INT), 0, 0, 0) AS ts
           |  FROM range(90)) GROUP BY 1 ORDER BY g""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(qf.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq == exp,
        s"$fn(ts) group census must match Spark's own recomputation")
    }
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

  test("months()/years() layouts: aligned slices HANDLED, calendar extracts group from metadata (r13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.arch (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (months(ts))""".stripMargin)
    // 4 calendar months (Jan–Apr 2024), 25 rows each
    sql("""INSERT INTO gns.web.arch
          |SELECT id, TIMESTAMP '2024-01-10 00:00:00'
          |           + make_interval(0, CAST(id % 4 AS INT))
          |FROM range(100)""".stripMargin)
    def isLocal(q: DataFrame): Boolean = {
      q.collect()
      allNodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // a month-aligned slice decides whole leaves: zero-task count
    val q1 = sql("""SELECT CAST(count(*) AS BIGINT) AS c FROM gns.web.arch
                   |WHERE ts >= TIMESTAMP '2024-02-01 00:00:00'
                   |  AND ts <  TIMESTAMP '2024-03-01 00:00:00'""".stripMargin)
    assert(q1.head.getLong(0) == 25L)
    assert(isLocal(q1),
      s"month-aligned slice must be zero-task:\n${q1.queryExecution.executedPlan}")
    // GROUP BY month(ts): constant per month leaf — answers per leaf
    val q2 = sql("""SELECT month(ts) AS m, CAST(count(*) AS BIGINT) AS c
                   |FROM gns.web.arch GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(q2.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 25L), (2, 25L), (3, 25L), (4, 25L)))
    assert(isLocal(q2), "month extract must group from metadata")
    // quarters merge 3 month leaves per group
    val q3 = sql("""SELECT quarter(ts) AS q, CAST(count(*) AS BIGINT) AS c
                   |FROM gns.web.arch GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(q3.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 75L), (2, 25L)))
    assert(isLocal(q3), "quarter extract must merge month leaves")
    // an unaligned boundary stays residual: real scan, correct rows
    val q4 = sql("""SELECT CAST(count(*) AS BIGINT) AS c FROM gns.web.arch
                   |WHERE ts >= TIMESTAMP '2024-02-15 00:00:00'""".stripMargin)
    assert(q4.head.getLong(0) == 50L)
    assert(!isLocal(q4), "mid-month boundaries must scan for real")
    // a DATE grouping is NOT constant over a month leaf: falls back
    val q5 = sql("""SELECT CAST(count(*) AS BIGINT) AS groups
                   |FROM (SELECT CAST(ts AS DATE) FROM gns.web.arch
                   |      GROUP BY 1)""".stripMargin)
    assert(q5.head.getLong(0) == 4L)
    assert(!isLocal(q5), "date grouping over month leaves must scan")
    // years(): YEAR extract groups, Jan-1 boundary handles
    sql("""CREATE TABLE gns.web.archy (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (years(ts))""".stripMargin)
    sql("""INSERT INTO gns.web.archy
          |SELECT id, TIMESTAMP '2023-06-10 00:00:00'
          |           + make_interval(CAST(id % 2 AS INT), 0)
          |FROM range(40)""".stripMargin)
    val q6 = sql("""SELECT year(ts) AS y, CAST(count(*) AS BIGINT) AS c
                   |FROM gns.web.archy GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(q6.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((2023, 20L), (2024, 20L)))
    assert(isLocal(q6), "year extract must group from metadata")
    val q7 = sql("""SELECT CAST(count(*) AS BIGINT) AS c FROM gns.web.archy
                   |WHERE ts < TIMESTAMP '2024-01-01 00:00:00'""".stripMargin)
    assert(q7.head.getLong(0) == 20L)
    assert(isLocal(q7), "a January-1st boundary must be zero-task")
  }

  test("limit pushdown composes with leaf-scoped tombstones (r13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.limdel (uid BIGINT, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES ('write.delete.mode' 'merge-on-read')""".stripMargin)
    for (d <- 1 to 4)
      sql(s"INSERT INTO gns.web.limdel SELECT id + $d * 1000, $d FROM range(100)")
    // positional tombstones land in day=4 only: files of days 1-3
    // carry exact LIVE counts and can cover a limit alone
    sql("DELETE FROM gns.web.limdel WHERE uid >= 4090")
    val t = IcebergLikeTable(spark, s"$warehouse/web/limdel", "day")
    val total = t.filesFor(lit(true)).size
    GraftNativeScan.clearPrune(t.path)
    val rows = sql("SELECT * FROM gns.web.limdel LIMIT 5").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(0) < 4090),
      "the cut must deliver live rows only")
    val (planned, _) = GraftNativeScan.lastPrune(t.path)
      .getOrElse(fail("native scan did not plan"))
    assert(planned < total && planned >= 1,
      s"LIMIT 5 under non-intersecting tombstones must still cut: " +
        s"planned $planned of $total")
    // a limit the unmasked files cannot cover stands down (here: ask
    // for more rows than days 1-3 hold) — correct rows either way
    val big = sql("SELECT count(*) FROM (SELECT * FROM gns.web.limdel LIMIT 350)")
    assert(big.head.getLong(0) == 350)
  }

  test("partition filters are HANDLED exactly: escaped values, the null partition, both scan paths") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.hf (uid BIGINT, p STRING)
          |PARTITIONED BY (p)""".stripMargin)
    sql("""INSERT INTO gns.web.hf VALUES
          |(1, 'plain'), (2, 'plain'), (3, 'a b'), (4, 'x%y'),
          |(5, NULL), (6, '')""".stripMargin)
    // the scan itself must honor the filter row-for-row — Spark does
    // NOT re-apply a handled filter, so any leak here is wrong rows,
    // not a slow plan. Escaped leaf values must round-trip exactly.
    assert(sql("SELECT uid FROM gns.web.hf WHERE p = 'a b'")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(sql("SELECT uid FROM gns.web.hf WHERE p = 'x%y'")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(sql("SELECT uid FROM gns.web.hf WHERE p IN ('plain', 'a b') ORDER BY uid")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // Hive layout semantics: NULL and '' both live in the default
    // partition and read back as NULL — `p IS NULL` finds both, `p = ''`
    // matches nothing (row-wise filtering agrees: the column IS null)
    assert(sql("SELECT count(*) FROM gns.web.hf WHERE p IS NULL")
      .head.getLong(0) == 2L)
    assert(sql("SELECT count(*) FROM gns.web.hf WHERE p = ''")
      .head.getLong(0) == 0L)
    assert(sql("SELECT count(*) FROM gns.web.hf WHERE p IS NOT NULL")
      .head.getLong(0) == 4L)
    // negation translates exactly or stays residual — either way exact
    assert(sql("SELECT uid FROM gns.web.hf WHERE NOT (p = 'plain') ORDER BY uid")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    // plan-shape pin: a handled-only predicate leaves NO Filter node —
    // the scan is the filter (this is the contract everything above
    // exercises; pin it so a regression to residual is visible)
    val hq = sql("SELECT uid FROM gns.web.hf WHERE p = 'plain'")
    assert(!hq.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
      s"handled filter must be removed from the plan:\n" +
        s"${hq.queryExecution.optimizedPlan}")
    // …while a data-column predicate keeps its Filter
    val rq = sql("SELECT uid FROM gns.web.hf WHERE uid > 2")
    assert(rq.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]))
    // live EQUALITY deletes now read natively (r11), and the scan must
    // still apply handled partition filters row-for-row WHILE masking
    // the deleted key tuples (partition-decidable aggregate pushdown
    // correctly refuses — masked rows are a data question)
    sql("""CREATE TABLE gns.web.hfmor (uid BIGINT, day INT, seq BIGINT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (uniqueKeys 'uid', numBuckets '2',
          |orderCol 'seq', 'write.delete.mode' 'merge-on-read')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"INSERT INTO gns.web.hfmor SELECT id + $d * 100, $d, 1 FROM range(10)")
    sql("DELETE FROM gns.web.hfmor WHERE uid % 100 >= 8")
    val m = sql("SELECT count(*) FROM gns.web.hfmor WHERE day = 2")
    assert(batchScans(m).nonEmpty,
      "equality-delete snapshot must take the native V2 scan")
    assert(m.head.getLong(0) == 8L)
    // time travel composes: the pinned snapshot decides the leaves
    sql("CREATE TABLE gns.web.hftt (n BIGINT, day INT) PARTITIONED BY (day)")
    sql("INSERT INTO gns.web.hftt VALUES (1, 1)")
    sql("INSERT INTO gns.web.hftt VALUES (2, 1)")
    assert(sql("SELECT count(*) FROM gns.web.hftt VERSION AS OF 1 WHERE day = 1")
      .head.getLong(0) == 1L)
  }

  test("FILTERED aggregate pushdown: partition-decidable WHERE stays a zero-task manifest lookup") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.fagg (uid BIGINT, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    for (d <- 1 to 4)
      sql(s"INSERT INTO gns.web.fagg SELECT id + ${d * 1000}, $d FROM range(25)")
    def isLocal(q: DataFrame): Boolean = {
      q.collect()
      allNodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // the VERDICT's headline case: count(*) WHERE day = 3, zero tasks
    val q1 = sql("SELECT count(*) FROM gns.web.fagg WHERE day = 3")
    assert(q1.head.getLong(0) == 25L)
    assert(isLocal(q1), s"expected LocalTableScan:\n${q1.queryExecution.executedPlan}")
    // min/max restrict to the matching leaves' bounds
    val q2 = sql("""SELECT count(*) AS c, min(uid) AS lo, max(uid) AS hi
                   |FROM gns.web.fagg WHERE day >= 3""".stripMargin)
    val r2 = q2.head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((50L, 3000L, 4024L)))
    assert(isLocal(q2))
    // grouped: GROUP BY the partition column UNDER a partition filter
    val q3 = sql("""SELECT day, count(*) AS c FROM gns.web.fagg
                   |WHERE day IN (2, 4) GROUP BY day ORDER BY day""".stripMargin)
    assert(q3.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((2, 25L), (4, 25L)))
    assert(isLocal(q3))
    // an empty matching set counts 0 (and min/max refuse → still correct)
    val q4 = sql("SELECT count(*) FROM gns.web.fagg WHERE day = 99")
    assert(q4.head.getLong(0) == 0L)
    assert(isLocal(q4))
    assert(sql("SELECT min(uid) FROM gns.web.fagg WHERE day = 99").head.isNullAt(0))
    // a MIXED predicate (data column involved) is residual: real scan,
    // correct answer
    val q5 = sql("SELECT count(*) FROM gns.web.fagg WHERE day = 2 AND uid >= 2010")
    assert(q5.head.getLong(0) == 15L)
    assert(!isLocal(q5), "mixed predicates must fall back to a real scan")
    // hidden days() partitioning hands over DAY-ALIGNED half-lines
    // (r11, see the dedicated time-slice test) — this aligned boundary
    // is now a zero-task lookup too; unaligned ones stay residual
    sql("""CREATE TABLE gns.web.faggh (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    sql("""INSERT INTO gns.web.faggh
          |SELECT id, timestamp'2024-03-05 10:00:00' + make_interval(0,0,0,CAST(id%3 AS INT),0,0,0)
          |FROM range(30)""".stripMargin)
    val q6 = sql("SELECT count(*) FROM gns.web.faggh WHERE ts >= timestamp'2024-03-06 00:00:00'")
    assert(q6.head.getLong(0) == 20L)
    assert(isLocal(q6), "aligned day boundary must answer from the manifest")
    val q6b = sql("SELECT count(*) FROM gns.web.faggh WHERE ts >= timestamp'2024-03-06 10:00:00'")
    assert(q6b.head.getLong(0) == 20L)
    assert(!isLocal(q6b), "unaligned boundaries must scan")
    // …but GROUP BY CAST(ts AS DATE) on the days() table IS decidable:
    // each leaf value is the UTC day ordinal = the DATE's internal value
    val q7 = sql("""SELECT CAST(ts AS DATE) AS d, count(*) AS c
                   |FROM gns.web.faggh GROUP BY CAST(ts AS DATE)
                   |ORDER BY d""".stripMargin)
    assert(q7.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ==
      Seq(("2024-03-05", 10L), ("2024-03-06", 10L), ("2024-03-07", 10L)))
    assert(isLocal(q7),
      s"days-grouped count must answer from the manifest:\n" +
        s"${q7.queryExecution.executedPlan}")
  }

  test("filtered metadata aggregates compose with NON-INTERSECTING tombstones (r13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.faggdel (uid BIGINT, day INT, seq BIGINT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (uniqueKeys 'uid', numBuckets '2', orderCol 'seq',
          |statsColumns 'uid', 'write.delete.mode' 'merge-on-read')""".stripMargin)
    for (d <- 1 to 4)
      sql(s"INSERT INTO gns.web.faggdel SELECT id + ${d * 1000}, $d, 1 FROM range(25)")
    // a data-column retraction scoped to day 4: its equality tombstones
    // live in day=4 leaves only
    sql("DELETE FROM gns.web.faggdel WHERE uid >= 4020")
    def isLocal(q: DataFrame): Boolean = {
      q.collect()
      allNodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // the filtered count over UNMASKED leaves stays a zero-task lookup
    // — leaf-scoped tombstones in day 4 cannot touch day 2's counts
    val q1 = sql("SELECT count(*) FROM gns.web.faggdel WHERE day = 2")
    assert(q1.head.getLong(0) == 25L)
    assert(isLocal(q1),
      s"non-intersecting tombstones must not disable the filtered " +
        s"pushdown:\n${q1.queryExecution.executedPlan}")
    // a filter KEEPING the tombstoned leaf refuses (masked rows) and
    // the real scan answers correctly
    val q2 = sql("SELECT count(*) FROM gns.web.faggdel WHERE day = 4")
    assert(q2.head.getLong(0) == 20L)
    assert(!isLocal(q2),
      "a kept masked leaf must force the real scan")
    // and the UNFILTERED count still refuses (every leaf contributes)
    val q3 = sql("SELECT count(*) FROM gns.web.faggdel")
    assert(q3.head.getLong(0) == 95L)
    assert(!isLocal(q3))
  }

  test("day-aligned time filters are HANDLED on days() tables: the dashboard time slice is zero-task") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.tslice (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    // 3 days × 20 rows, plus NULL-timestamp strays in the null leaf
    sql("""INSERT INTO gns.web.tslice
          |SELECT id,
          |       timestamp'2024-03-05 06:00:00' +
          |         make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0)
          |FROM range(60)""".stripMargin)
    sql("INSERT INTO gns.web.tslice VALUES (900, NULL), (901, NULL)")
    def isLocal(q: DataFrame): Boolean = {
      q.collect()
      allNodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // the universal dashboard query: count in an aligned time window
    val q1 = sql("""SELECT count(*) FROM gns.web.tslice
                   |WHERE ts >= timestamp'2024-03-06 00:00:00'
                   |  AND ts < timestamp'2024-03-07 00:00:00'""".stripMargin)
    assert(q1.head.getLong(0) == 20L)
    assert(isLocal(q1),
      s"aligned time-slice count must be zero-task:\n" +
        s"${q1.queryExecution.executedPlan}")
    // one-sided half-line + the grouped variant under the filter
    val q2 = sql("""SELECT CAST(ts AS DATE) AS d, count(*) AS c
                   |FROM gns.web.tslice
                   |WHERE ts >= timestamp'2024-03-06 00:00:00'
                   |GROUP BY CAST(ts AS DATE) ORDER BY d""".stripMargin)
    assert(q2.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ==
      Seq(("2024-03-06", 20L), ("2024-03-07", 20L)))
    assert(isLocal(q2))
    // an UNALIGNED boundary stays residual: real scan, right answer
    val q3 = sql("""SELECT count(*) FROM gns.web.tslice
                   |WHERE ts >= timestamp'2024-03-06 06:00:00'""".stripMargin)
    assert(q3.head.getLong(0) == 40L)
    assert(!isLocal(q3), "unaligned boundaries must scan")
    // ROW queries under a handled filter must be exact (Spark does not
    // re-filter): NULL-timestamp rows stay excluded, boundaries honored
    val rows = sql("""SELECT uid FROM gns.web.tslice
                     |WHERE ts >= timestamp'2024-03-07 00:00:00'
                     |ORDER BY uid""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == (0 until 60).filter(_ % 3 == 2).map(_.toLong))
    assert(sql("SELECT count(*) FROM gns.web.tslice WHERE ts IS NOT NULL")
      .head.getLong(0) == 60L)
    assert(sql("SELECT count(*) FROM gns.web.tslice").head.getLong(0) == 62L)
    // the same leaf-exactness generalizes to hours() …
    sql("""CREATE TABLE gns.web.hslice (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (hours(ts))""".stripMargin)
    sql("""INSERT INTO gns.web.hslice
          |SELECT id, timestamp'2024-03-05 06:30:00' +
          |       make_interval(0,0,0,0,CAST(id % 4 AS INT),0,0)
          |FROM range(40)""".stripMargin)
    val h1 = sql("""SELECT count(*) FROM gns.web.hslice
                   |WHERE ts >= timestamp'2024-03-05 08:00:00'""".stripMargin)
    assert(h1.head.getLong(0) == 20L)
    assert(isLocal(h1), "hour-aligned boundary must be zero-task")
    val h2 = sql("""SELECT count(*) FROM gns.web.hslice
                   |WHERE ts >= timestamp'2024-03-05 08:30:00'""".stripMargin)
    assert(h2.head.getLong(0) == 20L)
    assert(!isLocal(h2), "sub-hour boundaries must scan")
    // … and to truncate() over an integral source
    sql("""CREATE TABLE gns.web.trslice (uid BIGINT, bucket_src BIGINT)
          |PARTITIONED BY (truncate(100, bucket_src))""".stripMargin)
    sql("INSERT INTO gns.web.trslice SELECT id, id * 7 FROM range(100)")
    val t1 = sql("SELECT count(*) FROM gns.web.trslice WHERE bucket_src >= 300")
    assert(t1.head.getLong(0) ==
      (0 until 100).count(_ * 7 >= 300).toLong)
    assert(isLocal(t1), "width-aligned integral boundary must be zero-task")
    val t2 = sql("SELECT count(*) FROM gns.web.trslice WHERE bucket_src >= 350")
    assert(t2.head.getLong(0) ==
      (0 until 100).count(_ * 7 >= 350).toLong)
    assert(!isLocal(t2), "unaligned integral boundaries must scan")
  }

  test("filtered LIMIT: a partition-exact WHERE still truncates the file list") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.flim (uid BIGINT, day INT)
          |PARTITIONED BY (day)""".stripMargin)
    for (d <- 1 to 3; _ <- 1 to 2)
      sql(s"INSERT INTO gns.web.flim SELECT id, $d FROM range(50)")
    val t = IcebergLikeTable(spark, s"$warehouse/web/flim", "day")
    val total = t.filesFor(lit(true)).size
    GraftNativeScan.clearPrune(t.path)
    val rows = sql("SELECT * FROM gns.web.flim WHERE day = 2 LIMIT 5").collect()
    assert(rows.length == 5 && rows.forall(_.getInt(1) == 2))
    val (planned, _) = GraftNativeScan.lastPrune(t.path)
      .getOrElse(fail("native scan did not plan"))
    assert(planned < total && planned >= 1,
      s"WHERE day=2 LIMIT 5 must open a covering subset: $planned of $total")
  }

  test("time travel reads natively against the pinned snapshot") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("CREATE TABLE gns.web.tt (n BIGINT)")
    sql("INSERT INTO gns.web.tt VALUES (1)")
    sql("INSERT INTO gns.web.tt VALUES (2)")
    // r12: the pinned snapshot's own manifests answer the aggregate —
    // a historical count is a zero-task lookup too (Iceberg's posture)
    val q = sql("SELECT count(*) FROM gns.web.tt VERSION AS OF 1")
    q.collect()
    assert(allNodes(q.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      s"pinned count must answer from the pinned manifest:\n" +
        s"${q.queryExecution.executedPlan}")
    assert(q.head.getLong(0) == 1L)
    // ROW reads against the pinned snapshot stay on the native scan
    val qr = sql("SELECT n FROM gns.web.tt VERSION AS OF 1")
    assert(batchScans(qr).nonEmpty)
    assert(qr.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(sql("SELECT count(*) FROM gns.web.tt").head.getLong(0) == 2L)
  }

  test("native scan under equality deletes + rename epochs: the mask composes with per-epoch schemas (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.eqren
          |(id BIGINT, user_id BIGINT, tag STRING, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'id', numBuckets '2',
          |orderCol 'seq', 'write.delete.mode' 'merge-on-read')""".stripMargin)
    sql("""INSERT INTO gns.web.eqren
          |SELECT id, id % 10, concat('t', id % 3), 1 FROM range(60)""".stripMargin)
    sql("DELETE FROM gns.web.eqren WHERE user_id = 3")
    // the GDPR table renames a DATA column mid-life: stored files (and
    // the gen-1 delete files) predate the rename; r11 fell back to V1
    sql("ALTER TABLE gns.web.eqren RENAME COLUMN tag TO label")
    sql("DELETE FROM gns.web.eqren WHERE user_id = 7")
    val live = (0 until 60).filter(i => i % 10 != 3 && i % 10 != 7)
    val q = sql("""SELECT label, count(*) AS c, sum(id) AS s
                  |FROM gns.web.eqren GROUP BY label ORDER BY label""".stripMargin)
    assert(batchScans(q).nonEmpty,
      "eq deletes under a rename epoch must keep the native scan (r12)")
    assert(q.collect().toSeq ==
      live.groupBy(i => s"t${i % 3}").toSeq.sortBy(_._1).map { case (t, is) =>
        org.apache.spark.sql.Row(t, is.size.toLong, is.map(_.toLong).sum)
      })
    // a projection WITHOUT the key: the reader reads `id` as an extra
    // trailing column under its epoch's physical name and still masks
    val q2 = sql("SELECT count(*) FROM gns.web.eqren WHERE label = 't1'")
    q2.collect()
    assert(batchScans(q2).nonEmpty)
    assert(q2.head.getLong(0) == live.count(_ % 3 == 1).toLong)
  }

  test("multi-spec grouped metadata aggregates: GROUP BY event / day,event on PARTITIONED BY (days(ts), event) is zero-task (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // the everyday Iceberg layout: a time leg AND an identity leg
    sql("""CREATE TABLE gns.web.mgrp (uid BIGINT, event STRING, ts TIMESTAMP)
          |PARTITIONED BY (days(ts), event)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    sql("""INSERT INTO gns.web.mgrp
          |SELECT id, concat('e', id % 3),
          |  timestamp'2024-03-04 06:00:00' +
          |  make_interval(0, 0, 0, CAST(id % 4 AS INT), 0, CAST(id AS INT), 0)
          |FROM range(120)""".stripMargin)
    def oracle(sel: String, group: String): Seq[org.apache.spark.sql.Row] =
      spark.sql(
        s"""SELECT $sel FROM (
           |  SELECT id AS uid, concat('e', id % 3) AS event,
           |    timestamp'2024-03-04 06:00:00' +
           |    make_interval(0, 0, 0, CAST(id % 4 AS INT), 0, CAST(id AS INT), 0) AS ts
           |  FROM range(120)) $group""".stripMargin).collect().toSeq
    // GROUP BY the identity leg — the most common dashboard pivot
    val q1 = sql("""SELECT event, count(*) AS c, min(uid) AS lo, max(uid) AS hi
                   |FROM gns.web.mgrp GROUP BY event ORDER BY event""".stripMargin)
    assert(zeroTask(q1), s"GROUP BY event must be a zero-task manifest " +
      s"lookup:\n${q1.queryExecution.executedPlan}")
    assert(q1.collect().toSeq ==
      oracle("event, count(*) AS c, min(uid) AS lo, max(uid) AS hi",
        "GROUP BY event ORDER BY event"))
    // MULTI-KEY GROUP BY: the time leg (through CAST AS DATE) + event
    val q2 = sql("""SELECT CAST(ts AS DATE) AS d, event, count(*) AS c
                   |FROM gns.web.mgrp GROUP BY 1, 2 ORDER BY d, event""".stripMargin)
    assert(zeroTask(q2), s"GROUP BY day, event must be zero-task:\n" +
      s"${q2.queryExecution.executedPlan}")
    assert(q2.collect().toSeq ==
      oracle("CAST(ts AS DATE) AS d, event, count(*) AS c",
        "GROUP BY 1, 2 ORDER BY d, event"))
    // extract-grouped leg composes with the identity leg
    val q3 = sql("""SELECT dayofweek(ts) AS dw, event, count(*) AS c
                   |FROM gns.web.mgrp GROUP BY 1, 2 ORDER BY dw, event""".stripMargin)
    assert(zeroTask(q3))
    assert(q3.collect().toSeq ==
      oracle("dayofweek(ts) AS dw, event, count(*) AS c",
        "GROUP BY 1, 2 ORDER BY dw, event"))
    // a leg referencing a DATA column must really scan — same answer
    val q4 = sql("""SELECT uid % 2 AS p, count(*) AS c
                   |FROM gns.web.mgrp GROUP BY 1 ORDER BY p""".stripMargin)
    q4.collect()
    assert(batchScans(q4).nonEmpty,
      "a data-column grouping must fall back to a real scan")
    assert(q4.collect().toSeq ==
      oracle("uid % 2 AS p, count(*) AS c", "GROUP BY 1 ORDER BY p"))
    // NULL leg values group under the null key (SQL semantics)
    sql("""INSERT INTO gns.web.mgrp
          |SELECT id + 1000, NULL, timestamp'2024-03-04 06:00:00'
          |FROM range(7)""".stripMargin)
    val q5 = sql("""SELECT event, count(*) AS c FROM gns.web.mgrp
                   |GROUP BY event ORDER BY event NULLS FIRST""".stripMargin)
    assert(zeroTask(q5))
    val r5 = q5.collect()
    assert(r5.head.isNullAt(0) && r5.head.getLong(1) == 7L)
    assert(r5.map(_.getLong(1)).sum == 127L)
  }

  test("multi-spec HANDLED filters: per-leg predicates decide whole leaves exactly (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    sql("""CREATE TABLE gns.web.mhf (uid BIGINT, event STRING, ts TIMESTAMP)
          |PARTITIONED BY (days(ts), event)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    // escaped identity values + NULL legs ride along
    sql("""INSERT INTO gns.web.mhf
          |SELECT id,
          |  CASE WHEN id % 11 = 10 THEN NULL
          |       WHEN id % 3 = 2 THEN 'a b|c'
          |       ELSE concat('e', id % 3) END,
          |  timestamp'2024-03-04 00:00:00' +
          |  make_interval(0, 0, 0, CAST(id % 4 AS INT), CAST(id % 20 AS INT), 0, 0)
          |FROM range(200)""".stripMargin)
    def oracle(where: String): Long = spark.sql(
      s"""SELECT count(*) FROM (
         |  SELECT id AS uid,
         |    CASE WHEN id % 11 = 10 THEN NULL
         |         WHEN id % 3 = 2 THEN 'a b|c'
         |         ELSE concat('e', id % 3) END AS event,
         |    timestamp'2024-03-04 00:00:00' +
         |    make_interval(0, 0, 0, CAST(id % 4 AS INT), CAST(id % 20 AS INT), 0, 0) AS ts
         |  FROM range(200)) WHERE $where""".stripMargin).head.getLong(0)
    // identity-leg equality: the dashboard's `WHERE event = ...` is a
    // zero-task count on the everyday layout, exact rows on projection
    val q1 = sql("SELECT count(*) AS c FROM gns.web.mhf WHERE event = 'e1'")
    assert(zeroTask(q1), s"identity-leg equality must be a zero-task " +
      s"manifest count:\n${q1.queryExecution.executedPlan}")
    assert(q1.head.getLong(0) == oracle("event = 'e1'"))
    // the filter is HANDLED (not re-applied): row reads must be exact,
    // including the escaped value and the composite separator
    assert(sql("SELECT uid FROM gns.web.mhf WHERE event = 'a b|c'")
      .collect().length.toLong == oracle("event = 'a b|c'"))
    assert(sql("SELECT count(*) FROM gns.web.mhf WHERE event IS NULL")
      .head.getLong(0) == oracle("event IS NULL"))
    assert(sql("SELECT count(*) FROM gns.web.mhf WHERE event IS NOT NULL")
      .head.getLong(0) == oracle("event IS NOT NULL"))
    assert(sql("SELECT count(*) FROM gns.web.mhf WHERE event IN ('e0', 'e1')")
      .head.getLong(0) == oracle("event IN ('e0', 'e1')"))
    assert(sql("SELECT count(*) FROM gns.web.mhf WHERE NOT (event = 'e1')")
      .head.getLong(0) == oracle("NOT (event = 'e1')"))
    // time-leg half-line composes with the identity leg: aligned
    // boundaries are handled (zero-task with the event conjunct)...
    val q2 = sql("""SELECT count(*) AS c FROM gns.web.mhf
                   |WHERE ts >= timestamp'2024-03-05 00:00:00' AND event = 'e0'""".stripMargin)
    assert(zeroTask(q2), s"day-aligned slice × identity leg must be " +
      s"zero-task:\n${q2.queryExecution.executedPlan}")
    assert(q2.head.getLong(0) ==
      oracle("ts >= timestamp'2024-03-05 00:00:00' AND event = 'e0'"))
    // ...and filtered GROUP BY stays metadata-answered
    val q3 = sql("""SELECT CAST(ts AS DATE) AS d, count(*) AS c
                   |FROM gns.web.mhf WHERE event = 'e0'
                   |GROUP BY 1 ORDER BY d""".stripMargin)
    assert(zeroTask(q3))
    assert(q3.collect().map(_.getLong(1)).sum == oracle("event = 'e0'"))
    // unaligned time boundaries and data-column predicates stay
    // residual — real scan, same answers
    val q4 = sql("""SELECT count(*) FROM gns.web.mhf
                   |WHERE ts >= timestamp'2024-03-05 00:30:00'""".stripMargin)
    q4.collect()
    assert(batchScans(q4).nonEmpty, "unaligned boundary must really scan")
    assert(q4.head.getLong(0) ==
      oracle("ts >= timestamp'2024-03-05 00:30:00'"))
    val q5 = sql("SELECT count(*) FROM gns.web.mhf WHERE event = 'e1' AND uid % 2 = 0")
    q5.collect()
    assert(batchScans(q5).nonEmpty, "mixed predicate must really scan")
    assert(q5.head.getLong(0) == oracle("event = 'e1' AND uid % 2 = 0"))
  }

  test("pushed-aggregate planning is version-consistent under a racing commit (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.race (v BIGINT, day INT)
          |PARTITIONED BY (day)""".stripMargin)
    sql("INSERT INTO gns.web.race SELECT id, 1 FROM range(10)")
    val t = IcebergLikeTable(spark, s"$warehouse/web/race", "day")
    val builder = new GraftScanBuilder(t, None,
      spark.table("gns.web.race").schema)
    val agg = new org.apache.spark.sql.connector.expressions.aggregate
      .Aggregation(
        Array(new org.apache.spark.sql.connector.expressions.aggregate
          .CountStar()),
        Array.empty)
    // Spark probes, then pushes, the SAME Aggregation instance; a
    // commit racing in between must not mix versions inside one answer
    assert(builder.supportCompletePushDown(agg))
    sql("INSERT INTO gns.web.race SELECT id, 2 FROM range(5)")
    assert(builder.pushAggregation(agg))
    val rows = builder.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.LocalScan].rows
    assert(rows.head.getLong(0) == 10L,
      "probe and push must answer from ONE resolved snapshot")
    // fresh planning sees the racing commit
    assert(sql("SELECT count(*) FROM gns.web.race").head.getLong(0) == 15L)
  }

  test("multi-spec handled filters: adversarial value alphabet round-trips exactly (r12)") {
    import spark.implicits._
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    // every layer's special characters at once: the composite separator
    // and its escape, the null token, path-escaped characters, case,
    // whitespace, empty string, NULL
    val alphabet: Seq[Option[String]] = Seq(
      Some("plain"), Some("PLAIN"), Some("a b"), Some("x%y"), Some("x|y"),
      Some("%N"), Some("%25N"), Some("%7C"), Some(""), Some("eq=v"),
      Some("hash#v"), Some("colon:v"), Some("slash/v"), Some("quote'v"),
      None)
    val rows = for {
      d <- 0 until 2
      (v, i) <- alphabet.zipWithIndex
      r <- 0 until 3
    } yield (d.toLong * 100 + i * 3 + r, v.orNull,
      java.sql.Timestamp.valueOf(s"2024-03-0${d + 1} 0$r:00:00"))
    sql("""CREATE TABLE gns.web.alpha (uid BIGINT, event STRING, ts TIMESTAMP)
          |PARTITIONED BY (days(ts), event)""".stripMargin)
    rows.toDF("uid", "event", "ts").createOrReplaceTempView("graft_alpha_src")
    sql("INSERT INTO gns.web.alpha SELECT * FROM graft_alpha_src")
    assert(sql("SELECT count(*) FROM gns.web.alpha").head.getLong(0) ==
      rows.size.toLong)
    def expectEq(v: String): Long = rows.count(_._2 == v).toLong
    // Column-API filters dodge SQL literal quoting for the specials
    val tbl = spark.table("gns.web.alpha")
    alphabet.flatten.foreach { v =>
      assert(tbl.filter(col("event") === v).count() == expectEq(v),
        s"equality must be row-exact for '$v'")
      assert(tbl.filter(col("event") =!= v).count() ==
        rows.count(r => r._2 != null && r._2 != v).toLong,
        s"negated equality must be row-exact for '$v'")
    }
    assert(tbl.filter(col("event").isNull).count() ==
      rows.count(_._2 == null).toLong)
    assert(tbl.filter(col("event").isNotNull).count() ==
      rows.count(_._2 != null).toLong)
    assert(tbl.filter(col("event").isin("a b", "x|y", "%N")).count() ==
      rows.count(r => Set("a b", "x|y", "%N").contains(r._2)).toLong)
    // null-safe equality both ways
    assert(tbl.filter(col("event") <=> lit(null)).count() ==
      rows.count(_._2 == null).toLong)
    assert(tbl.filter(col("event") <=> "x%y").count() == expectEq("x%y"))
    // LIKE shapes decide whole leaves exactly on a string leg (r12)
    assert(tbl.filter(col("event").startsWith("a ")).count() ==
      rows.count(r => r._2 != null && r._2.startsWith("a ")).toLong)
    assert(tbl.filter(col("event").endsWith("N")).count() ==
      rows.count(r => r._2 != null && r._2.endsWith("N")).toLong)
    assert(tbl.filter(col("event").contains("%")).count() ==
      rows.count(r => r._2 != null && r._2.contains("%")).toLong)
  }

  test("date identity legs: grouping and handled filters answer from leaves (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    sql("""CREATE TABLE gns.web.dleg (uid BIGINT, d DATE, event STRING)
          |PARTITIONED BY (d, event)
          |TBLPROPERTIES (statsColumns 'uid')""".stripMargin)
    sql("""INSERT INTO gns.web.dleg
          |SELECT id, date_add(date'2024-03-01', CAST(id % 3 AS INT)),
          |       concat('e', id % 2)
          |FROM range(60)""".stripMargin)
    // GROUP BY the date leg: the ISO leaf rendering parses back to the
    // DATE's epoch-day value
    val q1 = sql("""SELECT d, event, count(*) AS c FROM gns.web.dleg
                   |GROUP BY d, event ORDER BY d, event""".stripMargin)
    assert(zeroTask(q1), s"date-leg grouping must be zero-task:\n" +
      s"${q1.queryExecution.executedPlan}")
    assert(q1.collect().map(r =>
      (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSeq ==
      (for (m <- 0 to 2; e <- 0 to 1) yield
        (s"2024-03-0${m + 1}", s"e$e", 10L)))
    // handled date-leg equality: zero-task count, exact row read
    val q2 = sql("SELECT count(*) AS c FROM gns.web.dleg WHERE d = date'2024-03-02'")
    assert(zeroTask(q2), s"date-leg equality must be a zero-task count:\n" +
      s"${q2.queryExecution.executedPlan}")
    assert(q2.head.getLong(0) == 20L)
    assert(sql("SELECT uid FROM gns.web.dleg WHERE d = date'2024-03-02'")
      .collect().length == 20)
    // COUNT(DISTINCT d) = the distinct leg values
    val q3 = sql("SELECT count(DISTINCT d) AS dd FROM gns.web.dleg")
    assert(zeroTask(q3))
    assert(q3.head.getLong(0) == 3L)
  }

  test("AVG and COUNT(DISTINCT partition-dim) push to metadata (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    def zeroTask(q: DataFrame): Boolean = {
      q.collect()
      batchScans(q).isEmpty && allNodes(q.queryExecution.executedPlan)
        .exists(_.isInstanceOf[
          org.apache.spark.sql.execution.LocalTableScanExec])
    }
    sql("""CREATE TABLE gns.web.avgd (v BIGINT, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'v')""".stripMargin)
    for (d <- 1 to 3)
      sql(s"""INSERT INTO gns.web.avgd
             |SELECT IF(id % 5 = 0, NULL, id + $d * 100), $d
             |FROM range(50)""".stripMargin)
    // whole-table AVG: exact (sum stamp) / (rows − nulls)
    val vals = (1 to 3).flatMap(d =>
      (0 until 50).filter(_ % 5 != 0).map(_ + d * 100L))
    val q = sql("SELECT avg(v) AS a, count(*) AS c FROM gns.web.avgd")
    assert(zeroTask(q), s"AVG(bigint) must answer from the manifest:\n" +
      s"${q.queryExecution.executedPlan}")
    assert(q.head() == org.apache.spark.sql.Row(
      vals.sum.toDouble / vals.size, 150L))
    // grouped AVG by the partition column
    val qg = sql("SELECT day, avg(v) AS a FROM gns.web.avgd GROUP BY day ORDER BY day")
    assert(zeroTask(qg))
    assert(qg.collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq ==
      (1 to 3).map { d =>
        val vs = (0 until 50).filter(_ % 5 != 0).map(_ + d * 100L)
        (d, vs.sum.toDouble / vs.size)
      })
    // COUNT(DISTINCT day) = the distinct leaf count, zero tasks
    val qd = sql("SELECT count(DISTINCT day) AS d, count(*) AS c FROM gns.web.avgd")
    assert(zeroTask(qd), s"COUNT(DISTINCT partition-dim) must answer " +
      s"from the manifest:\n${qd.queryExecution.executedPlan}")
    assert(qd.head() == org.apache.spark.sql.Row(3L, 150L))
    // filtered variant stays zero-task; a DATA-column distinct scans
    val qf = sql("SELECT count(DISTINCT day) AS d FROM gns.web.avgd WHERE day >= 2")
    assert(zeroTask(qf))
    assert(qf.head.getLong(0) == 2L)
    val qv = sql("SELECT count(DISTINCT v) AS d FROM gns.web.avgd")
    qv.collect()
    assert(batchScans(qv).nonEmpty,
      "COUNT(DISTINCT data-column) must fall back to a real scan")
    // COUNT(DISTINCT CAST(ts AS DATE)) + COUNT(DISTINCT month(ts)) on a
    // hidden days() layout: leaf ordinals / merged extracts
    sql("""CREATE TABLE gns.web.avdt (uid BIGINT, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    sql("""INSERT INTO gns.web.avdt
          |SELECT id, timestamp'2024-03-28 12:00:00' +
          |  make_interval(0, 0, 0, CAST(id % 9 AS INT), 0, 0, 0)
          |FROM range(45)""".stripMargin)
    val qt = sql("""SELECT count(DISTINCT CAST(ts AS DATE)) AS days,
                   |       count(DISTINCT month(ts)) AS months
                   |FROM gns.web.avdt""".stripMargin)
    assert(zeroTask(qt), s"distinct day/month counts must answer from " +
      s"leaves:\n${qt.queryExecution.executedPlan}")
    assert(qt.head() == org.apache.spark.sql.Row(9L, 2L))
    // AVG over an all-null group is NULL; AVG of a float column scans
    sql("""CREATE TABLE gns.web.avn (v BIGINT, w DOUBLE, day INT)
          |PARTITIONED BY (day)
          |TBLPROPERTIES (statsColumns 'v,w')""".stripMargin)
    sql("INSERT INTO gns.web.avn SELECT CAST(NULL AS BIGINT), 1.5, 1 FROM range(5)")
    val qn = sql("SELECT avg(v) AS a FROM gns.web.avn")
    assert(zeroTask(qn))
    assert(qn.head.isNullAt(0), "AVG over only nulls must be NULL")
    val qw = sql("SELECT avg(w) AS a FROM gns.web.avn")
    qw.collect()
    assert(batchScans(qw).nonEmpty,
      "floating-point AVG must fall back to a real scan")
  }

  test("dynamic pruning reaches HASH buckets: a dim filter prunes bucket-leaf files (r14)") {
    // the GDPR/user-history pattern driven through a JOIN instead of a
    // literal: the dim side's surviving keys route back as a runtime
    // IN-filter, each key hashes to its bucket through the transform
    // membership oracle, and the fact scan re-plans to the matching
    // bucket leaves only — dynamic partition pruning over a hash
    // layout, where no interval could ever prune
    sql("CREATE NAMESPACE IF NOT EXISTS gns.web")
    sql("""CREATE TABLE gns.web.bfact (uid BIGINT, v BIGINT)
          |PARTITIONED BY (bucket(8, uid))""".stripMargin)
    spark.range(4000).selectExpr("id AS uid", "id AS v").coalesce(1)
      .createOrReplaceTempView("gns_bf_src")
    sql("INSERT INTO gns.web.bfact SELECT * FROM gns_bf_src")
    sql("CREATE TABLE gns.web.bdim (uid BIGINT, tag STRING)")
    sql("INSERT INTO gns.web.bdim VALUES (7,'HOT'),(8,'cold'),(9,'cold')")
    val t = IcebergLikeTable(spark, s"$warehouse/web/bfact",
      partitionCol = "uid_bucket",
      partitionTransform = Some("bucket(8, uid)"))
    val total = t.filesFor(lit(true)).size
    assert(total > 1, s"fixture must spread over several buckets: $total")
    GraftNativeScan.clearPrune(t.path)
    val res = sql("""SELECT count(*) FROM gns.web.bfact f
                    |JOIN gns.web.bdim d ON f.uid = d.uid
                    |WHERE d.tag = 'HOT'""".stripMargin)
    assert(res.head.getLong(0) == 1L)
    val (_, runtime) = GraftNativeScan.lastPrune(t.path)
      .getOrElse(fail("native scan did not plan"))
    assert(runtime >= 0, "dynamic pruning must have re-planned the fact scan")
    assert(runtime < total && runtime > 0,
      s"join-driven pruning must cut to the surviving keys' buckets: " +
        s"$runtime of $total")
  }
}
