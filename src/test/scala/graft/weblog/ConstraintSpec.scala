package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** CHECK constraints: stamped as table state in the manifest meta,
  * validated against existing rows at ADD, enforced per row at the
  * engine's single commit point (every write path), ANSI semantics
  * (NULL passes).
  */
class ConstraintSpec extends SparkTestBase {

  private def fresh(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t", "event")

  private def rows(pairs: (String, java.lang.Long)*): DataFrame = {
    import spark.implicits._
    pairs.toSeq.toDF("id", "amount").withColumn("event", lit("view"))
  }

  test("add validates existing rows; every write path enforces; drop lifts") {
    val t = fresh("chk_basic")
    t.append(rows("a" -> 10L, "b" -> 20L))
    // existing violation refuses the ADD
    intercept[IllegalArgumentException](
      t.addConstraint("amount_big", "amount >= 15"))
    t.addConstraint("amount_pos", "amount >= 0")
    assert(t.constraints == Map("amount_pos" -> "amount >= 0"))
    intercept[IllegalArgumentException](
      t.addConstraint("amount_pos", "amount >= 1")) // duplicate name
    val v = t.currentVersion.get
    // violating append fails BEFORE the commit point: version + rows unchanged
    val ex = intercept[Exception](t.append(rows("c" -> -5L)))
    assert(exMessageChain(ex).contains("amount_pos"),
      s"error should name the constraint: ${exMessageChain(ex).take(300)}")
    assert(t.currentVersion.contains(v))
    assert(t.read.count() == 2)
    // NULL passes (ANSI CHECK: UNKNOWN is not a violation)
    t.append(rows("n" -> null.asInstanceOf[java.lang.Long]))
    assert(t.read.count() == 3)
    // UPDATE through the engine enforces too
    intercept[Exception](t.update(col("id") === "a", Seq("amount" -> lit(-1L))))
    assert(t.read.filter(col("id") === "a").head.getAs[Long]("amount") == 10L)
    // replaceWhere enforces on the new batch
    intercept[Exception](t.replaceWhere(col("id") === "b",
      rows("b" -> -2L).filter(col("id") === "b")))
    // drop lifts the guard
    t.dropConstraint("amount_pos")
    assert(t.constraints.isEmpty)
    t.append(rows("c" -> -5L))
    assert(t.read.count() == 4)
    intercept[IllegalArgumentException](t.dropConstraint("absent"))
  }

  private def exMessageChain(e: Throwable): String = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
  }

  test("constraints are table state: survive commits, rollback, and fresh handles") {
    val t = fresh("chk_state")
    t.append(rows("a" -> 10L))
    val preConstraint = t.currentVersion.get
    t.addConstraint("pos", "amount >= 0")
    t.append(rows("b" -> 20L))
    // a fresh handle resolves the constraint from the manifest
    val t2 = IcebergLikeTable(spark, t.path, "event")
    assert(t2.constraints == Map("pos" -> "amount >= 0"))
    intercept[Exception](t2.append(rows("x" -> -1L)))
    // rollback keeps the constraint (table config, not data)
    t.rollbackTo(preConstraint)
    assert(t.constraints == Map("pos" -> "amount >= 0"))
    intercept[Exception](t.append(rows("y" -> -1L)))
  }

  test("column DEFAULT values: CREATE-time, SET/DROP DEFAULT, ADD-with-default refused") {
    val wh = Files.createTempDirectory("def_sql").toString
    spark.conf.set("spark.sql.catalog.gdef", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdef.web")
    spark.sql("CREATE TABLE gdef.web.t (id STRING, qty BIGINT DEFAULT 7)")
    spark.sql("INSERT INTO gdef.web.t (id) VALUES ('a')")
    spark.sql("INSERT INTO gdef.web.t VALUES ('b', DEFAULT)")
    spark.sql("INSERT INTO gdef.web.t VALUES ('c', 3)")
    def qty(id: String): Option[Long] = {
      val r = spark.table("gdef.web.t").filter(col("id") === id).head
      if (r.isNullAt(r.fieldIndex("qty"))) None
      else Some(r.getAs[Long]("qty"))
    }
    assert(qty("a").contains(7L) && qty("b").contains(7L) && qty("c").contains(3L))
    spark.sql("ALTER TABLE gdef.web.t ALTER COLUMN qty SET DEFAULT 9")
    spark.sql("INSERT INTO gdef.web.t (id) VALUES ('d')")
    assert(qty("d").contains(9L))
    spark.sql("ALTER TABLE gdef.web.t ALTER COLUMN qty DROP DEFAULT")
    spark.sql("INSERT INTO gdef.web.t VALUES ('e', DEFAULT)")
    assert(qty("e").isEmpty, "DEFAULT after DROP DEFAULT is NULL")
    // an ADD-time default would need read-side backfill of existing
    // rows, which the engine serves as NULL — refused loudly
    val ex = intercept[Exception](
      spark.sql("ALTER TABLE gdef.web.t ADD COLUMN extra BIGINT DEFAULT 5"))
    assert(exMessageChain(ex).contains("SET DEFAULT"),
      s"got: ${exMessageChain(ex).take(200)}")
  }

  test("keyed tables surface their unique keys as an informational primary key") {
    val wh = Files.createTempDirectory("pk_sql").toString
    spark.conf.set("spark.sql.catalog.gpkc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpkc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpkc.web")
    spark.sql("CREATE TABLE gpkc.web.k (id STRING, amount BIGINT, seq BIGINT) " +
      "TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq')")
    val cat = spark.sessionState.catalogManager.catalog("gpkc")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("web"), "k"))
    val pk = tbl.constraints().collectFirst {
      case p: org.apache.spark.sql.connector.catalog.constraints.PrimaryKey => p
    }
    assert(pk.isDefined, "keyed table must surface a primary key")
    // informational only: the raw append path does not merge on the
    // keys, so neither enforced nor RELY may be claimed (the optimizer
    // would otherwise be licensed to eliminate aggregates on them)
    assert(!pk.get.enforced() && !pk.get.rely())
    assert(pk.get.columns().map(_.describe()).toSeq == Seq("id"))
  }

  test("SQL: ALTER TABLE ADD/DROP CONSTRAINT CHECK through the catalog") {
    val wh = Files.createTempDirectory("chk_sql").toString
    spark.conf.set("spark.sql.catalog.gchk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gchk.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gchk.web")
    spark.sql("CREATE TABLE gchk.web.t (id STRING, amount BIGINT)")
    spark.sql("INSERT INTO gchk.web.t VALUES ('a', 10)")
    spark.sql("ALTER TABLE gchk.web.t ADD CONSTRAINT amount_pos CHECK (amount >= 0)")
    spark.sql("INSERT INTO gchk.web.t VALUES ('b', 5)") // valid
    val ex = intercept[Exception](
      spark.sql("INSERT INTO gchk.web.t VALUES ('c', -1)"))
    assert(exMessageChain(ex).toLowerCase.contains("amount_pos") ||
      exMessageChain(ex).toLowerCase.contains("check"),
      s"violation should surface: ${exMessageChain(ex).take(300)}")
    assert(spark.table("gchk.web.t").count() == 2)
    spark.sql("ALTER TABLE gchk.web.t DROP CONSTRAINT amount_pos")
    spark.sql("INSERT INTO gchk.web.t VALUES ('c', -1)")
    assert(spark.table("gchk.web.t").count() == 3)

    // ADD CONSTRAINT BEFORE the first insert: the catalog materializes
    // the schema stamp with an empty commit so the constraint has a
    // manifest to live in — the table must stay fully usable
    spark.sql("CREATE TABLE gchk.web.fresh (id STRING, amount BIGINT)")
    spark.sql("ALTER TABLE gchk.web.fresh ADD CONSTRAINT pos CHECK (amount >= 0)")
    assert(spark.table("gchk.web.fresh").count() == 0)
    spark.sql("INSERT INTO gchk.web.fresh VALUES ('a', 1)")
    intercept[Exception](
      spark.sql("INSERT INTO gchk.web.fresh VALUES ('b', -1)"))
    assert(spark.table("gchk.web.fresh").count() == 1)
    // a typo'd predicate refuses at ADD time, not at the next write
    intercept[Exception](spark.sql(
      "ALTER TABLE gchk.web.fresh ADD CONSTRAINT bad CHECK (no_such_col > 0)"))
    spark.sql("INSERT INTO gchk.web.fresh VALUES ('c', 2)") // still writable
    assert(spark.table("gchk.web.fresh").count() == 2)
  }

  test("engine addConstraint refuses uncommitted tables; predicate analyzes on empty ones") {
    val t = fresh("chk_empty")
    intercept[IllegalArgumentException](t.addConstraint("pos", "amount >= 0"))
    // empty COMMITTED table: predicate must analyze (and a bad one refuse)
    t.append(rows()) // zero-row append materializes the schema stamp
    t.addConstraint("pos", "amount >= 0")
    intercept[Exception](t.addConstraint("bad", "no_such_col > 0"))
    intercept[Exception](t.append(rows("x" -> -1L)))
    t.append(rows("ok" -> 5L))
    assert(t.read.count() == 1)
  }
}
