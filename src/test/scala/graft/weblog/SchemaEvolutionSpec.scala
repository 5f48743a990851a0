package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Column rename/drop through stable column ids (Iceberg's column-id
  * indirection via parquet field ids): metadata-only commits, correct
  * reads across every file epoch, time travel under the historical
  * name, and no resurrection on drop + re-add.
  */
class SchemaEvolutionSpec extends SparkTestBase {

  private def freshTable(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t", "event", Nil)

  private def batch(ids: Range, hostCol: String, host: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"u$i", "view", host)).toDF("user_id", "event", hostCol)
  }

  test("rename is metadata-only and reads every epoch by column id") {
    val t = freshTable("se_rename")
    t.append(batch(0 until 10, "host", "old.example"))
    val v1 = t.currentVersion.get
    val filesBefore = t.files.select("file").collect().map(_.getString(0)).toSet

    val v2 = t.renameColumn("host", "hostname")
    assert(v2 == v1 + 1)
    // not a single data file changed — the commit is one manifest
    assert(t.files.select("file").collect().map(_.getString(0)).toSet
      == filesBefore)

    // pre-rename files serve their values under the NEW name
    assert(t.read.columns.toSeq == Seq("user_id", "hostname", "event"))
    assert(t.read.filter(col("hostname") === "old.example").count() == 10)

    // post-rename appends mix with pre-rename files in one scan
    t.append(batch(10 until 15, "hostname", "new.example"))
    assert(t.read.count() == 15)
    assert(t.read.filter(col("hostname") === "old.example").count() == 10)
    assert(t.read.filter(col("hostname") === "new.example").count() == 5)

    // time travel: the pre-rename snapshot still shows the old name
    val hist = t.readAt(v1)
    assert(hist.columns.contains("host") && !hist.columns.contains("hostname"))
    assert(hist.filter(col("host") === "old.example").count() == 10)

    // chained rename composes
    t.renameColumn("hostname", "server")
    assert(t.read.filter(col("server") === "old.example").count() == 10)
    assert(t.read.filter(col("server") === "new.example").count() == 5)
  }

  test("colhist survives MOR-delete and rollback commits after a rename") {
    import spark.implicits._
    // keyed table (MOR delete needs keys) with an extra data column
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("se_carry").toString + "/t",
      "event", Seq("user_id"), numBuckets = 2)
    t.write((0 until 10).map(i => (s"u$i", "view", "old.example", 1L))
      .toDF("user_id", "event", "host", "seq"), "seq")
    t.renameColumn("host", "hostname")

    // an equality-delete commit must carry the column history forward
    t.deleteMergeOnRead(col("user_id") === "u0")
    assert(t.read.count() == 9)
    assert(t.read.filter(col("hostname") === "old.example").count() == 9,
      "pre-rename files lost their values after a MOR delete commit")

    // and a positional-delete commit
    t.deletePositional(col("user_id") === "u1")
    assert(t.read.filter(col("hostname") === "old.example").count() == 8,
      "pre-rename files lost their values after a positional delete commit")

    // rollback to a post-rename version keeps the target's history
    val v = t.currentVersion.get
    t.append(Seq(("u99", "view", "x", 2L))
      .toDF("user_id", "event", "hostname", "seq"))
    t.rollbackTo(v)
    assert(t.read.filter(col("hostname") === "old.example").count() == 8,
      "pre-rename files lost their values after rollback")
  }

  test("widenColumn: int->bigint and float->double promote old files at scan") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("se_widen").toString + "/t", "event",
      statsColumns = Seq("n"))
    t.append(Seq(("a", "view", 1, 1.5f), ("b", "view", 2, 2.5f))
      .toDF("id", "event", "n", "x").coalesce(1))
    t.widenColumn("n", org.apache.spark.sql.types.LongType)
    t.widenColumn("x", org.apache.spark.sql.types.DoubleType)
    // the old int32/float file reads under the widened schema
    assert(t.read.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(t.read.filter(col("n") === 2L).count() == 1)
    assert(t.read.agg(org.apache.spark.sql.functions.sum("x")).head.getDouble(0) == 4.0)
    // new writes carry the wide type; both epochs scan together
    t.append(Seq(("c", "view", 3L, 9.0)).toDF("id", "event", "n", "x").coalesce(1))
    assert(t.read.count() == 3)
    assert(t.read.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) == 6L)
    // stamped bounds from the narrow epoch still prune soundly
    assert(t.filesFor(col("n") === 3L).size == 1)
    assert(t.readWhere(col("n") === 3L).count() == 1)
    // time travel reads the narrow epoch under its own schema
    assert(t.readAt(1).schema("n").dataType == org.apache.spark.sql.types.IntegerType)

    // guards: narrowing, keys, bloom columns
    intercept[IllegalArgumentException](
      t.widenColumn("n", org.apache.spark.sql.types.IntegerType))
    val keyed = IcebergLikeTable(spark,
      Files.createTempDirectory("se_widen_k").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    keyed.write(Seq((1, "view", 1L)).toDF("k", "event", "seq"), "seq")
    intercept[IllegalArgumentException](
      keyed.widenColumn("k", org.apache.spark.sql.types.LongType))
    val bloomed = IcebergLikeTable(spark,
      Files.createTempDirectory("se_widen_b").toString + "/t", "event",
      bloomColumns = Seq("n"))
    bloomed.append(Seq(("a", "view", 1)).toDF("id", "event", "n"))
    intercept[IllegalArgumentException](
      bloomed.widenColumn("n", org.apache.spark.sql.types.LongType))
  }

  test("drop hides the data; re-adding the name never resurrects it") {
    import spark.implicits._
    val t = freshTable("se_drop")
    t.append(batch(0 until 8, "host", "secret.example"))
    t.dropColumn("host")
    assert(!t.read.columns.contains("host"))
    assert(t.read.count() == 8)

    // re-add the same NAME: a fresh column id — old values must stay
    // buried even though they sit in the same physical files
    t.append(Seq(("u100", "view", "fresh.example"))
      .toDF("user_id", "event", "host"))
    val back = t.read
    assert(back.columns.contains("host"))
    assert(back.filter(col("host") === "secret.example").count() == 0,
      "dropped data must never resurrect under a re-added name")
    assert(back.filter(col("host") === "fresh.example").count() == 1)
    assert(back.filter(col("host").isNull).count() == 8)
  }

  test("rename composes with keyed tables, upserts and CDC") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("se_keyed").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    def rows(ids: Range, c: String, v: String, seq: Long) =
      ids.map(i => (s"k$i", "e", v, seq)).toDF("k", "event", c, "seq")
    t.write(rows(0 until 10, "host", "a", 1L), "seq")
    t.renameColumn("host", "hostname")
    t.write(rows(0 until 3, "hostname", "b", 2L), "seq")
    assert(t.read.filter(col("hostname") === "b").count() == 3)
    assert(t.read.filter(col("hostname") === "a").count() == 7)
    // CDC across the post-rename window speaks the new name
    val live = t.currentVersion.get
    val ch = t.changesBetween(live - 1, live)
    assert(ch.filter(col("_change_type") === "update_postimage")
      .filter(col("hostname") === "b").count() == 3)
  }

  test("guards: layout/key columns, unknown and colliding names") {
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("se_guard").toString + "/t",
      "event", Seq("k"), numBuckets = 2)
    import spark.implicits._
    t.write(Seq(("k1", "e", "h", 1L)).toDF("k", "event", "host", "seq"), "seq")
    intercept[IllegalArgumentException](t.renameColumn("event", "evt"))
    intercept[IllegalArgumentException](t.renameColumn("k", "key"))
    intercept[IllegalArgumentException](t.dropColumn("k"))
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](t.renameColumn("host", "event"))
  }

  test("rename refuses while pre-id files are live; maintain unblocks it") {
    import spark.implicits._
    val t = freshTable("se_legacy")
    t.append(batch(0 until 6, "host", "old.example"))
    // simulate a PRE-ID epoch: strip the id bookkeeping from the live
    // manifest (what a table written by an older library looks like)
    val root = new org.apache.hadoop.fs.Path(t.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = t.currentVersion.get
    val snap = Manifests.snapshotAt(fs, root, v).get
    Manifests.write(fs, root, v + 1, snap.files,
      snap.meta - "colids" - "idsfrom")
    val e = intercept[IllegalArgumentException](t.renameColumn("host", "hostname"))
    assert(e.getMessage.contains("maintain"))
    // the next real commit re-stamps ids, but the OLD files still
    // predate the stamp — only a rewrite clears them
    t.append(batch(6 until 8, "host", "old.example"))
    intercept[IllegalArgumentException](t.renameColumn("host", "hostname"))
    t.maintain(fileThreshold = 0)
    t.renameColumn("host", "hostname")
    assert(t.read.filter(col("hostname") === "old.example").count() == 8)
  }
}
