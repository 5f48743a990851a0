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
