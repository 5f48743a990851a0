package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.ZOrder

/** Z-order layout maintenance: Morton-code rewrite →
  * multi-dimensional file skipping through the stamped bounds.
  */
class ZOrderSpec extends SparkTestBase {

  test("interleave is the Morton code on hand values; quantize is rank-exact") {
    // a = 0b01 (i=0), b = 0b10 (i=1), 2 bits: out = bit0(a)<<0 |
    // bit0(b)<<1 | bit1(a)<<2 | bit1(b)<<3 = 1 + 0 + 0 + 8 = 9
    val z = spark.range(1)
      .select(ZOrder.interleave(Seq(lit(1L), lit(2L)), 2).as("z"))
      .head.getLong(0)
    assert(z == 9L, s"expected Morton 9, got $z")
    // neighbours in (x, y) are near on the curve: (0,0)<(1,0)<(0,1)<(1,1)
    val corners = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).map { case (a, b) =>
      spark.range(1).select(ZOrder.interleave(Seq(lit(a), lit(b)), 1)).head.getLong(0)
    }
    assert(corners == Seq(0L, 1L, 2L, 3L))
    val q = spark.range(1)
      .select(ZOrder.quantize(lit(5.0), lit(0.0), lit(10.0), 4).as("q"))
      .head.getLong(0)
    assert(q == 7L, s"quantize(5, [0,10], 4 bits) should be floor(0.5*15)=7, got $q")
    // NULL and degenerate spans clamp to 0
    val q0 = spark.range(1)
      .select(ZOrder.quantize(lit(null).cast("double"), lit(0.0), lit(0.0), 4))
      .head.getLong(0)
    assert(q0 == 0L)
  }

  test("z-order rewrite: 2-D box prunes after, rows byte-identical, deletes consumed") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("zord").toString + "/t", "event",
      Nil, statsColumns = Seq("x", "y"))
    // a 64x64 grid in 4 unordered slices: every file spans the domain
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      ("e", x.toLong, y.toLong)))
      .toDF("event", "x", "y")
    for (g <- 0 to 3)
      t.append(grid.filter(pmod(xxhash64(col("x"), col("y")), lit(4)) === g)
        .coalesce(1))
    val before: DataFrame = t.read
    val beforeRows = before.collect().toSeq
    val box = col("x").between(8, 15) && col("y").between(8, 15)
    assert(t.filesFor(box).size == t.filesFor(lit(true)).size,
      "unordered layout must not prune the box")
    // a positional (merge-on-read) delete before the rewrite: the
    // rewrite must consume the tombstone (key-less table)
    val erased = t.deletePositional(col("x") === 63 && col("y") === 63)
    assert(erased == 1L)
    val leaves = t.maintainZOrder(Seq("x", "y"), targetFiles = 16)
    assert(leaves.nonEmpty)
    // multiset identity (minus the erased row)
    val after = t.read
    assert(after.count() == 64 * 64 - 1)
    assert(after.exceptAll(before.filter(!(col("x") === 63 && col("y") === 63)))
      .isEmpty)
    // tombstones consumed by the rewrite
    assert(t.files.filter(col("is_delete")).count() == 0)
    // the box now prunes to a fraction of the files
    val total = t.filesFor(lit(true)).size
    val hit = t.filesFor(box).size
    assert(hit * 2 <= total, s"box hit $hit of $total files after z-order")
    // time travel still reads the pre-rewrite layout
    assert(t.readAt(t.currentVersion.get - 1).count() == 64 * 64 - 1)
  }

  test("where-scoped z-order rewrites only implicated leaves, carries the rest by reference") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("zord_w").toString + "/t", "event",
      Nil, statsColumns = Seq("x", "y"))
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y =>
      (if (x % 2 == 0) "a" else "b", x.toLong, y.toLong)))
      .toDF("event", "x", "y")
    for (g <- 0 to 1)
      t.append(grid.filter(pmod(xxhash64(col("x"), col("y")), lit(2)) === g)
        .coalesce(1))
    val before = t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    val leaves = t.maintainZOrder(Seq("x", "y"), targetFiles = 4,
      where = Some(col("event") === "a"))
    assert(leaves == Seq("a"), s"only event=a may rewrite, got $leaves")
    val after = t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    assert(before.filter(_.startsWith("event=b/")) ==
      after.filter(_.startsWith("event=b/")),
      "event=b files must carry over by reference")
    assert((before.diff(after) ++ after.diff(before)).forall(_.startsWith("event=a/")))
    assert(t.read.count() == 32 * 32)
    // scoped CALL through SQL composes the same way
    val miss = t.maintainZOrder(Seq("x", "y"), targetFiles = 4,
      where = Some(col("event") === "zzz"))
    assert(miss.isEmpty, "a predicate implying no leaves is a no-op")
  }

  test("guards: column count, non-numeric, unknown column, empty table") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("zord_g").toString + "/t", "event")
    assert(t.maintainZOrder(Seq("a", "b")) == Nil) // uncommitted: no-op
    t.append(Seq(("e", "s", 1L)).toDF("event", "name", "x"))
    intercept[IllegalArgumentException](t.maintainZOrder(Seq("x")))
    intercept[IllegalArgumentException](t.maintainZOrder(Seq("x", "name")))
    intercept[IllegalArgumentException](t.maintainZOrder(Seq("x", "absent")))
  }

  test("CALL g.system.zorder through SQL") {
    val wh = Files.createTempDirectory("zord_sql").toString
    spark.conf.set("spark.sql.catalog.gzo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gzo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gzo.web")
    spark.sql("CREATE TABLE gzo.web.pts (ev STRING, x BIGINT, y BIGINT) " +
      "PARTITIONED BY (ev) TBLPROPERTIES (statsColumns 'x,y')")
    spark.sql("INSERT INTO gzo.web.pts SELECT 'e', id % 32, id / 32 " +
      "FROM range(1024)")
    val res = spark.sql(
      "CALL gzo.system.zorder(table => 'web.pts', zorder_by => 'x,y', " +
        "target_files => 8)").collect()
    assert(res.head.getInt(0) >= 1)
    assert(spark.table("gzo.web.pts").count() == 1024)
  }
}
