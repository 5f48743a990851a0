package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The DSv2 catalog: graft tables as plain SQL objects — DDL, DML,
  * time travel, schema evolution, all through `spark.sql`, no graft
  * imports in user code.
  */
class GraftCatalogSpec extends SparkTestBase {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", w)
    w
  }

  private def sql(q: String) = { warehouse; spark.sql(q) }

  /** Engine handle for a catalog table (descriptor-faithful). */
  private def loadIceberg(ns: String, t: String): graft.weblog.IcebergLikeTable = {
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/$ns/$t")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val desc = GraftCatalog.Descriptor.read(fs,
      new org.apache.hadoop.fs.Path(dir, GraftCatalog.DescriptorFile))
    graft.weblog.IcebergLikeTable(spark, dir.toString,
      partitionCol = desc.partitionCol, uniqueKeys = desc.uniqueKeys,
      numBuckets = desc.numBuckets, retainVersions = desc.retainVersions,
      statsColumns = desc.statsColumns, bloomColumns = desc.bloomColumns,
      partitionTransform = desc.transform)
  }

  test("namespace + hidden-partitioned table: DDL, INSERT, pruned SELECT") {
    sql("CREATE NAMESPACE gcat.web")
    assert(sql("SHOW NAMESPACES IN gcat").collect().map(_.getString(0))
      .contains("web"))
    sql("""CREATE TABLE gcat.web.events (
          |  user_id STRING, event STRING, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    assert(sql("SHOW TABLES IN gcat.web").collect().map(_.getString(1))
      .contains("events"))
    sql("""INSERT INTO gcat.web.events VALUES
          |('u1', 'view',  TIMESTAMP '2024-03-01 10:00:00'),
          |('u2', 'click', TIMESTAMP '2024-03-02 11:00:00'),
          |('u3', 'view',  TIMESTAMP '2024-03-03 12:00:00')""".stripMargin)
    assert(sql("SELECT count(*) FROM gcat.web.events").head.getLong(0) == 3)
    // the derived partition column stays hidden from SQL reads
    assert(sql("SELECT * FROM gcat.web.events").columns.toSet ==
      Set("user_id", "event", "ts"))
    val day2 = sql("""SELECT user_id FROM gcat.web.events
                    |WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'
                    |  AND ts <  TIMESTAMP '2024-03-03 00:00:00'""".stripMargin)
    assert(day2.collect().map(_.getString(0)).toSeq == Seq("u2"))
    // the predicate reached the table's own planning: one file scanned
    val t = graft.weblog.IcebergLikeTable(spark, s"$warehouse/web/events",
      partitionCol = "ts_day", partitionTransform = Some("days(ts)"))
    assert(t.filesFor(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-03 00:00:00"))).size == 1)
  }

  test("unpartitioned table: void transform, insert + overwrite") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.misc")
    sql("CREATE TABLE gcat.misc.kv (k STRING, v BIGINT)")
    sql("INSERT INTO gcat.misc.kv VALUES ('a', 1), ('b', 2)")
    assert(sql("SELECT sum(v) FROM gcat.misc.kv").head.getLong(0) == 3)
    sql("INSERT INTO gcat.misc.kv VALUES ('c', 3)")
    assert(sql("SELECT count(*) FROM gcat.misc.kv").head.getLong(0) == 3)
    sql("INSERT OVERWRITE gcat.misc.kv VALUES ('z', 9)")
    assert(sql("SELECT k, v FROM gcat.misc.kv").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("z", 9L)))
  }

  test("keyed table: INSERT INTO is the order-aware upsert") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.app")
    sql("""CREATE TABLE gcat.app.users (uid STRING, host STRING, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'uid', orderCol 'seq', numBuckets '2')
          |""".stripMargin)
    sql("INSERT INTO gcat.app.users VALUES ('u1','old',1),('u2','old',1)")
    sql("INSERT INTO gcat.app.users VALUES ('u1','new',2)") // upsert wins
    sql("INSERT INTO gcat.app.users VALUES ('u2','stale',0)") // older: loses
    val rows = sql("SELECT uid, host FROM gcat.app.users ORDER BY uid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("u1", "new"), ("u2", "old")))
  }

  test("time travel: VERSION AS OF and TIMESTAMP AS OF") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    sql("CREATE TABLE gcat.tt.log (id BIGINT)")
    sql("INSERT INTO gcat.tt.log VALUES (1)")
    Thread.sleep(20)
    val mid = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    Thread.sleep(20)
    sql("INSERT INTO gcat.tt.log VALUES (2)")
    assert(sql("SELECT count(*) FROM gcat.tt.log").head.getLong(0) == 2)
    assert(sql("SELECT count(*) FROM gcat.tt.log VERSION AS OF 1")
      .head.getLong(0) == 1)
    assert(sql(s"SELECT count(*) FROM gcat.tt.log TIMESTAMP AS OF '$mid'")
      .head.getLong(0) == 1)
    // a time-travel read is not writable
    intercept[Exception](sql("INSERT INTO gcat.tt.log VERSION AS OF 1 VALUES (3)"))
    // a TAG name resolves as the version ref (Iceberg's refs in AS OF)
    loadIceberg("tt", "log").tag("v1-release", 1L)
    assert(sql("SELECT count(*) FROM gcat.tt.log VERSION AS OF 'v1-release'")
      .head.getLong(0) == 1)
    intercept[Exception](
      sql("SELECT * FROM gcat.tt.log VERSION AS OF 'no-such-tag'"))
    // a BRANCH name reads that chain's HEAD (write-audit-publish:
    // inspect staged branch work through plain SQL before fast-forward)
    val branch = loadIceberg("tt", "log").createBranch("audit")
    import spark.implicits._
    branch.append(Seq(7L, 8L, 9L).toDF("id"))
    assert(sql("SELECT count(*) FROM gcat.tt.log VERSION AS OF 'audit'")
      .head.getLong(0) == 5)
    assert(sql("SELECT count(*) FROM gcat.tt.log").head.getLong(0) == 2,
      "main stays isolated from the branch read")
  }

  test("ALTER TABLE: rename, add, drop columns through SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo")
    sql("CREATE TABLE gcat.evo.t (a STRING, b BIGINT)")
    sql("INSERT INTO gcat.evo.t VALUES ('x', 1)")
    sql("ALTER TABLE gcat.evo.t RENAME COLUMN b TO n")
    assert(sql("SELECT n FROM gcat.evo.t").head.getLong(0) == 1)
    sql("ALTER TABLE gcat.evo.t ADD COLUMN extra STRING")
    assert(sql("SELECT extra FROM gcat.evo.t").head.isNullAt(0))
    sql("INSERT INTO gcat.evo.t VALUES ('y', 2, 'e')")
    assert(sql("SELECT count(*) FROM gcat.evo.t WHERE extra = 'e'")
      .head.getLong(0) == 1)
    sql("ALTER TABLE gcat.evo.t DROP COLUMN extra")
    assert(sql("SELECT * FROM gcat.evo.t").columns.toSet == Set("a", "n"))
  }

  test("ALTER COLUMN TYPE widens through SQL; old files promote at scan") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo")
    sql("CREATE TABLE gcat.evo.w (a STRING, n INT)")
    sql("INSERT INTO gcat.evo.w VALUES ('x', 7)")
    sql("ALTER TABLE gcat.evo.w ALTER COLUMN n TYPE BIGINT")
    assert(sql("DESCRIBE gcat.evo.w").collect()
      .exists(r => r.getString(0) == "n" && r.getString(1) == "bigint"))
    sql("INSERT INTO gcat.evo.w VALUES ('y', 5000000000)") // > int range
    assert(sql("SELECT sum(n) FROM gcat.evo.w").head.getLong(0) == 5000000007L)
    assert(sql("SELECT a FROM gcat.evo.w WHERE n = 7").head.getString(0) == "x")
  }

  test("ALTER pre-validation: a statically-refusable widen fails BEFORE any change applies") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.evo")
    sql("CREATE TABLE gcat.evo.pre (a STRING, n BIGINT, f FLOAT)")
    sql("INSERT INTO gcat.evo.pre VALUES ('x', 1, 0.5)")
    // narrowing bigint -> int is statically unsupported: the catalog
    // pre-pass refuses it before ANY change applies (no half-applied
    // multi-change ALTER), and the schema stays intact
    intercept[Exception](sql(
      "ALTER TABLE gcat.evo.pre ALTER COLUMN n TYPE INT"))
    assert(sql("DESCRIBE gcat.evo.pre").collect()
      .exists(r => r.getString(0) == "n" && r.getString(1) == "bigint"))
    // the supported widening still works
    sql("ALTER TABLE gcat.evo.pre ALTER COLUMN f TYPE DOUBLE")
    assert(sql("DESCRIBE gcat.evo.pre").collect()
      .exists(r => r.getString(0) == "f" && r.getString(1) == "double"))
    // a layout-column widen is refused in the pre-pass too
    sql("""CREATE TABLE gcat.evo.prek (k INT, v STRING, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'k', orderCol 'seq')""".stripMargin)
    intercept[Exception](sql(
      "ALTER TABLE gcat.evo.prek ALTER COLUMN k TYPE BIGINT"))
  }

  test("DELETE FROM: copy-on-write, merge-on-read, and truncate") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.del")
    // copy-on-write (default)
    sql("CREATE TABLE gcat.del.cow (uid STRING, n BIGINT)")
    sql("INSERT INTO gcat.del.cow VALUES ('u1',1),('u2',2),('u3',3)")
    sql("DELETE FROM gcat.del.cow WHERE uid = 'u2'")
    assert(sql("SELECT uid FROM gcat.del.cow ORDER BY uid").collect()
      .map(_.getString(0)).toSeq == Seq("u1", "u3"))
    // merge-on-read: positional delete files on a key-less table
    sql("""CREATE TABLE gcat.del.mor (uid STRING, n BIGINT)
          |TBLPROPERTIES ('write.delete.mode' 'merge-on-read')""".stripMargin)
    sql("INSERT INTO gcat.del.mor VALUES ('u1',1),('u2',2),('u3',3)")
    val t = graft.weblog.IcebergLikeTable(spark, s"$warehouse/del/mor",
      partitionCol = "gpart", partitionTransform = Some("void(uid)"))
    val dataBefore = t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    sql("DELETE FROM gcat.del.mor WHERE n >= 2")
    assert(sql("SELECT uid FROM gcat.del.mor").collect()
      .map(_.getString(0)).toSeq == Seq("u1"))
    val dataAfter = t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    assert(dataAfter == dataBefore, "MOR delete must touch no data file")
    assert(t.files.filter(col("is_delete")).count() > 0)
    // unqualified DELETE = truncate (one snapshot; history retained)
    sql("DELETE FROM gcat.del.cow")
    assert(sql("SELECT count(*) FROM gcat.del.cow").head.getLong(0) == 0)
  }

  test("SQL UPDATE: copy-on-write rewrite through the DML bridge") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    sql("CREATE TABLE gcat.dml.u (uid STRING, host STRING, n BIGINT)")
    sql("INSERT INTO gcat.dml.u VALUES ('u1','a',1),('u2','b',2),('u3','c',3)")
    sql("UPDATE gcat.dml.u SET host = 'z', n = n * 10 WHERE uid <> 'u2'")
    val rows = sql("SELECT uid, host, n FROM gcat.dml.u ORDER BY uid").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("u1", "z", 10L), ("u2", "b", 2L), ("u3", "z", 30L)))
  }

  test("SQL MERGE INTO: full clause algebra through the DML bridge") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    sql("CREATE TABLE gcat.dml.m (uid STRING, host STRING, n BIGINT)")
    sql("INSERT INTO gcat.dml.m VALUES ('u1','a',1),('u2','b',2),('u3','c',3)")
    spark.sql("""SELECT * FROM VALUES
                |('u1','A',10L,'up'), ('u2','B',20L,'del'), ('u9','Z',90L,'up')
                |AS s(uid, host, n, op)""".stripMargin)
      .createOrReplaceTempView("m_src")
    sql("""MERGE INTO gcat.dml.m t USING m_src s ON t.uid = s.uid
          |WHEN MATCHED AND s.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET host = s.host, n = s.n
          |WHEN NOT MATCHED THEN INSERT (uid, host, n) VALUES (s.uid, s.host, s.n)
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = t.n + 100
          |""".stripMargin)
    val rows = sql("SELECT uid, host, n FROM gcat.dml.m ORDER BY uid").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(
      ("u1", "A", 10L),   // matched update
      ("u3", "c", 103L),  // not matched by source
      ("u9", "Z", 90L)))  // inserted; u2 deleted
    // star actions
    sql("""MERGE INTO gcat.dml.m t USING (SELECT 'u3' AS uid, 'S' AS host,
          |7L AS n) s ON t.uid = s.uid
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT host, n FROM gcat.dml.m WHERE uid = 'u3'").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("S", 7L)))
  }

  test("CALL procedures: maintain, rollback, expire, vacuum, evolve spec") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.proc")
    sql("""CREATE TABLE gcat.proc.ev (uid STRING, ts TIMESTAMP)
          |PARTITIONED BY (days(ts))""".stripMargin)
    for (i <- 1 to 4)
      sql(s"INSERT INTO gcat.proc.ev VALUES ('u$i', TIMESTAMP '2024-03-01 0$i:00:00')")
    // 4 small files in the day leaf → maintain(0) compacts to 1
    val rewritten = sql(
      "CALL gcat.system.maintain(`table` => 'proc.ev', file_threshold => 0)")
      .head.getInt(0)
    assert(rewritten == 1)
    val t = graft.weblog.IcebergLikeTable(spark, s"$warehouse/proc/ev",
      partitionCol = "ts_day", partitionTransform = Some("days(ts)"))
    assert(t.filesFor(lit(true)).size == 1)
    // rollback via CALL restores the pre-compaction version's count
    val vNow = t.currentVersion.get
    sql(s"CALL gcat.system.rollback('proc.ev', ${vNow - 1})")
    assert(sql("SELECT count(*) FROM gcat.proc.ev").head.getLong(0) == 4)
    // evolve the partition spec through SQL; new writes derive hourly
    val res = sql(
      "CALL gcat.system.evolve_partition_spec('proc.ev', 'hours(ts)')").head
    assert(res.getString(0) == "hours(ts)")
    sql("INSERT INTO gcat.proc.ev VALUES ('u9', TIMESTAMP '2024-03-02 05:30:00')")
    assert(sql("SELECT count(*) FROM gcat.proc.ev").head.getLong(0) == 5)
    val t2 = graft.weblog.IcebergLikeTable(spark, s"$warehouse/proc/ev",
      partitionCol = "ts_day", partitionTransform = Some("hours(ts)"))
    assert(t2.filesFor(lit(true)).exists(_.startsWith("ts_day=4")),
      "post-evolve write must land in an hour-ordinal leaf")
    // expire + vacuum run clean
    assert(sql("CALL gcat.system.expire_snapshots('proc.ev', TIMESTAMP '2000-01-01')")
      .head.getInt(0) == 0)
    assert(sql("CALL gcat.system.vacuum('proc.ev')").head.getInt(0) == 1)
    assert(sql("SELECT count(*) FROM gcat.proc.ev").head.getLong(0) == 5)
  }

  test("CALL maintain_where: partition-scoped compaction via SQL") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.mw")
    sql("CREATE TABLE gcat.mw.t (grp STRING, n BIGINT) PARTITIONED BY (grp)")
    for (i <- 1 to 3) {
      sql(s"INSERT INTO gcat.mw.t VALUES ('a', $i)")
      sql(s"INSERT INTO gcat.mw.t VALUES ('b', $i)")
    }
    val t = graft.weblog.IcebergLikeTable(spark, s"$warehouse/mw/t", "grp")
    assert(t.filesFor(lit(true)).count(_.startsWith("grp=a/")) == 3)
    val n = sql("CALL gcat.system.maintain_where('mw.t', \"grp = 'a'\")")
      .head.getInt(0)
    assert(n == 1)
    val files = t.filesFor(lit(true))
    assert(files.count(_.startsWith("grp=a/")) == 1, "a compacted")
    assert(files.count(_.startsWith("grp=b/")) == 3, "b untouched")
    assert(sql("SELECT sum(n) FROM gcat.mw.t").head.getLong(0) == 12)
  }

  test("SQL MERGE prunes candidate files from source keys; CALL rewrite_clustered") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.dyn")
    sql("""CREATE TABLE gcat.dyn.t (uid BIGINT, v BIGINT)
          |TBLPROPERTIES ('write.cluster-by' 'uid', 'statsColumns' 'uid')
          |""".stripMargin)
    sql("INSERT INTO gcat.dyn.t SELECT id, id FROM range(100)")
    sql("INSERT INTO gcat.dyn.t SELECT id + 100, id FROM range(100)")
    val t = graft.weblog.IcebergLikeTable(spark, s"$warehouse/dyn/t",
      partitionCol = "gpart", partitionTransform = Some("void(uid)"),
      statsColumns = Seq("uid"))
    val before = t.filesFor(lit(true)).toSet
    assert(before.size >= 4)
    // the rule derives equi keys from ON; one source key → one file rewritten
    sql("""MERGE INTO gcat.dyn.t t USING (SELECT 7L AS uid, 999L AS v) s
          |ON t.uid = s.uid
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val after = t.filesFor(lit(true)).toSet
    assert((before -- after).size == 1,
      s"SQL equi-merge must rewrite one candidate file, replaced ${(before -- after).size}")
    assert(sql("SELECT v FROM gcat.dyn.t WHERE uid = 7").head.getLong(0) == 999L)
    assert(sql("SELECT count(*) FROM gcat.dyn.t").head.getLong(0) == 200L)
    // clustered rewrite through CALL re-sharpens the layout
    val leaves = sql(
      "CALL gcat.system.rewrite_clustered('dyn.t', 'uid')").head.getInt(0)
    assert(leaves == 1)
    assert(sql("SELECT count(*) FROM gcat.dyn.t").head.getLong(0) == 200L)
  }

  test("SQL metadata tables and write.cluster-by appends") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.meta")
    sql("""CREATE TABLE gcat.meta.t (uid STRING, n BIGINT)
          |TBLPROPERTIES ('write.cluster-by' 'n', 'write.cluster-files' '2',
          |               'statsColumns' 'n')""".stripMargin)
    sql("INSERT INTO gcat.meta.t SELECT CAST(id AS STRING), id FROM range(100)")
    // snapshots / files metadata tables through plain SQL
    assert(sql("SELECT count(*) FROM gcat.meta.t.snapshots").head.getLong(0) == 1)
    val files = sql("SELECT file FROM gcat.meta.t.files").collect()
      .map(_.getString(0))
    assert(files.nonEmpty)
    // clustered write: stats-stamped narrow slices prune a point lookup
    val t = graft.weblog.IcebergLikeTable(spark, s"$warehouse/meta/t",
      partitionCol = "gpart", partitionTransform = Some("void(uid)"),
      statsColumns = Seq("n"))
    assert(t.filesFor(col("n") === 7L).size < files.length,
      "cluster-by bounds must prune the point lookup")
    // tags metadata table
    t.tag("audit", t.currentVersion.get)
    assert(sql("SELECT tag, version FROM gcat.meta.t.tags").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("audit", 1L)))
    // partitions metadata table: per-leaf file/byte/row sums from the
    // manifest alone ("how big is each partition" with zero tasks)
    val parts = sql("""SELECT partition, n_files, size_bytes, row_count,
                      |n_delete_files FROM gcat.meta.t.partitions""".stripMargin)
      .collect()
    assert(parts.length == 1) // void transform: single null partition
    assert(parts.head.getLong(1) == files.length.toLong)
    assert(parts.head.getLong(3) == 100L)
    assert(parts.head.getLong(2) > 0L && parts.head.getLong(4) == 0L)
  }

  test("CTAS, RENAME TABLE, DROP TABLE") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.ops")
    sql("""CREATE TABLE gcat.ops.src AS
          |SELECT id, id % 3 AS grp FROM range(30)""".stripMargin)
    assert(sql("SELECT count(*) FROM gcat.ops.src").head.getLong(0) == 30)
    // RENAME TO takes a catalog-relative name (Spark's v2 contract)
    sql("ALTER TABLE gcat.ops.src RENAME TO ops.renamed")
    assert(sql("SELECT count(*) FROM gcat.ops.renamed").head.getLong(0) == 30)
    assert(!sql("SHOW TABLES IN gcat.ops").collect()
      .map(_.getString(1)).contains("src"))
    sql("DROP TABLE gcat.ops.renamed")
    assert(sql("SHOW TABLES IN gcat.ops").collect().isEmpty)
  }
}
