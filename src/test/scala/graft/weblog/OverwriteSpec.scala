package graft.weblog

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The overwrite family: full-table [[IcebergLikeTable.overwrite]],
  * dynamic-partition [[IcebergLikeTable.overwritePartitions]] and
  * predicate-scoped [[IcebergLikeTable.replaceWhere]] — all single
  * snapshot commits with create-only history.
  *
  * Reference analog: the dynamic-partition-overwrite posture of the
  * S10 upsert emulation (SURVEY.md §7.8; the reference delegates the
  * physical swap to Iceberg's INSERT OVERWRITE / replaceWhere).
  */
class OverwriteSpec extends SparkTestBase {

  private def day(n: Int, id: String, amt: Long): (String, Int, Long) =
    (id, n, amt)

  private def frame(rows: Seq[(String, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "day", "amount")
  }

  private def fresh(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t", "day")

  private def dataFiles(t: IcebergLikeTable): Set[String] =
    t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet

  /** The cause chain of a (possibly executor-wrapped) exception. */
  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("overwrite: truncate-reload in one commit; history time-travels; replay idempotent") {
    val t = fresh("ovw_full")
    t.append(frame(Seq(day(1, "a", 10), day(2, "b", 20))))
    val v1 = t.currentVersion.get
    t.overwrite(frame(Seq(day(3, "c", 30))), appendId = Some(("job", 7L)))
    assert(t.read.collect().map(_.getString(0)).toSeq == Seq("c"))
    // prior snapshot stays readable (create-only history)
    assert(t.readAt(v1).count() == 2)
    // exactly-once replay: the same (stream, batch) id commits nothing
    val v2 = t.currentVersion.get
    t.overwrite(frame(Seq(day(9, "z", 99))), appendId = Some(("job", 7L)))
    assert(t.currentVersion.contains(v2))
    assert(t.read.count() == 1)
  }

  test("overwritePartitions: swaps exactly the written leaves, carries the rest by reference") {
    val t = fresh("ovw_dyn")
    t.append(frame(Seq(day(1, "a", 10), day(1, "b", 11))))
    t.append(frame(Seq(day(2, "c", 20), day(2, "d", 21))))
    t.append(frame(Seq(day(3, "e", 30))))
    val before = dataFiles(t)
    t.overwritePartitions(frame(Seq(day(2, "x", 99))))
    val after = dataFiles(t)
    // only day=2 changed; day=1 and day=3 files carried BY REFERENCE
    assert((before.diff(after) ++ after.diff(before)).forall(_.startsWith("day=2/")),
      "only day=2 leaves may be touched")
    assert(before.filterNot(_.startsWith("day=2/")).subsetOf(after))
    val d2 = t.read.filter(col("day") === 2).collect()
    assert(d2.map(_.getString(0)).toSeq == Seq("x"))
    assert(t.read.count() == 4) // a,b (day1) + x (day2) + e (day3)
    // an empty batch writes no leaves → replaces nothing (full carry)
    val v = t.currentVersion.get
    t.overwritePartitions(frame(Nil))
    assert(dataFiles(t) == after)
    assert(t.read.count() == 4)
    // idempotent replay by appendId
    t.overwritePartitions(frame(Seq(day(3, "y", 1))), appendId = Some(("s", 1L)))
    val vAfter = t.currentVersion.get
    t.overwritePartitions(frame(Seq(day(3, "zz", 2))), appendId = Some(("s", 1L)))
    assert(t.currentVersion.contains(vAfter))
    assert(t.read.filter(col("day") === 3).collect().map(_.getString(0)).toSeq == Seq("y"))
  }

  test("overwritePartitions on a KEYED table replaces whole partitions, not just touched buckets") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("ovw_keyed").toString + "/t", "day",
      uniqueKeys = Seq("id"), numBuckets = 8)
    // 16 keys across day 1 and day 2 — they hash into many buckets
    val base = (1 to 16).map(i => (s"k$i", if (i <= 8) 1 else 2, i.toLong, 1L))
      .toDF("id", "day", "amount", "seq")
    t.write(base, "seq")
    assert(t.read.count() == 16)
    // the backfill batch has ONE key — it hashes into one bucket, but
    // the whole day=2 partition must be replaced (stale sibling buckets
    // must not survive and silently mix old and new data)
    t.overwritePartitions(Seq(("k99", 2, 999L, 2L)).toDF("id", "day", "amount", "seq"))
    val d2 = t.read.filter(col("day") === 2).collect()
    assert(d2.length == 1, s"day=2 must contain ONLY the batch, got ${d2.length} rows")
    assert(d2.head.getString(0) == "k99")
    assert(t.read.filter(col("day") === 1).count() == 8) // day=1 untouched
  }

  test("replaceWhere: predicate region swapped atomically; violations refused; empty batch = delete") {
    val t = fresh("rw_basic")
    t.append(frame(Seq(day(1, "a", 10), day(1, "b", 11))))
    t.append(frame(Seq(day(2, "c", 20), day(2, "d", 21))))
    t.append(frame(Seq(day(3, "e", 30))))
    // a batch row OUTSIDE the predicate region is refused — per row,
    // INSIDE the write plan (no separate validation pass), so the
    // failure surfaces as the write's raise_error and the table is
    // untouched (staging cleaned, version unchanged)
    val vBefore = t.currentVersion.get
    val refusal = intercept[Exception](
      t.replaceWhere(col("day") === 2, frame(Seq(day(3, "bad", 0)))))
    assert(exceptionChain(refusal).exists(
      _.getMessage != null) && exceptionChain(refusal).exists(m =>
        Option(m.getMessage).exists(_.contains("outside the replaced region"))))
    assert(t.currentVersion.contains(vBefore), "refusal must be atomic")
    val before = dataFiles(t)
    val removed = t.replaceWhere(col("day") === 2, frame(Seq(day(2, "x", 99))))
    assert(removed == 2L)
    val after = dataFiles(t)
    assert((before.diff(after) ++ after.diff(before)).forall(_.startsWith("day=2/")))
    assert(before.filterNot(_.startsWith("day=2/")).subsetOf(after))
    assert(t.read.filter(col("day") === 2).collect().map(_.getString(0)).toSeq == Seq("x"))
    assert(t.read.count() == 4)
    // empty batch → pure predicate delete
    assert(t.replaceWhere(col("day") === 2, frame(Nil)) == 1L)
    assert(t.read.filter(col("day") === 2).count() == 0)
    // nothing matched + nothing inserted → NO new version
    val v = t.currentVersion.get
    assert(t.replaceWhere(col("day") === 2, frame(Nil)) == 0L)
    assert(t.currentVersion.contains(v))
  }

  test("replaceWhere strict mode evaluates the batch exactly once (in-plan guard, no probe pass)") {
    val t = fresh("rw_onepass")
    t.append(frame(Seq(day(1, "a", 10), day(2, "c", 20))))
    val evals = spark.sparkContext.longAccumulator("rw_evals")
    import spark.implicits._
    val src = spark.createDataset(Seq(("x", 2, 99L), ("y", 2, 98L)))
      .map { r => evals.add(1); r }
      .toDF("id", "day", "amount")
    val removed = t.replaceWhere(col("day") === 2, src)
    assert(removed == 1L)
    assert(t.read.filter(col("day") === 2).count() == 2L)
    // the old contract check was a full `filter(!cond).isEmpty` probe —
    // a second evaluation of the batch; the per-row in-plan guard must
    // evaluate each source row exactly once (2 rows -> 2 evaluations)
    assert(evals.value == 2L,
      s"batch must be evaluated exactly once, saw ${evals.value} row evaluations")
  }

  test("replaceWhere: sub-partition predicate rewrites only containing files, survivors carry values") {
    val t = fresh("rw_subpart")
    // two files in day=1 (two appends), only one contains amount >= 100
    t.append(frame(Seq(day(1, "a", 10), day(1, "b", 150))))
    t.append(frame(Seq(day(1, "c", 20))))
    val before = dataFiles(t)
    val removed = t.replaceWhere(col("amount") >= 100, frame(Seq(day(1, "B", 500))))
    assert(removed == 1L)
    val after = dataFiles(t)
    // the c-only file contains no match — it must carry by reference
    assert((before.intersect(after)).nonEmpty,
      "files without matches must carry over by reference")
    // survivor 'a' (same file as 'b') is carried value-identical through the rewrite
    val rows = t.read.orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Long]("amount"))).toSeq
    assert(rows == Seq(("B", 500L), ("a", 10L), ("c", 20L)))
  }

  test("overwritePartitions and overwrite never read previous data (corrupt-file proof)") {
    val t = fresh("ovw_noread")
    t.append(frame(Seq(day(1, "a", 10))))
    t.append(frame(Seq(day(2, "b", 20))))
    // corrupt EVERY existing data file: any operation that opened one
    // would throw — proving the swap is pure metadata + batch write
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dataFiles(t).foreach { f =>
      val out = fs.create(new org.apache.hadoop.fs.Path(t.path, f), true)
      try out.write("not parquet".getBytes) finally out.close()
    }
    t.overwritePartitions(frame(Seq(day(2, "x", 99))))
    // the swapped partition reads fine (fresh file); day=1 carries the
    // corrupt file by reference, untouched — pruned reads never open it
    assert(t.readWhere(col("day") === 2).collect()
      .map(_.getAs[String]("id")).toSeq == Seq("x"))
    // full overwrite is equally read-free
    t.overwrite(frame(Seq(day(3, "z", 1))))
    assert(t.read.collect().map(_.getAs[String]("id")).toSeq == Seq("z"))
  }

  test("DataFrameWriterV2 overwrite(condition) routes to replaceWhere") {
    import spark.implicits._
    val wh = Files.createTempDirectory("ovw_w2").toString
    spark.conf.set("spark.sql.catalog.gow2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gow2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gow2.web")
    spark.sql("CREATE TABLE gow2.web.t (id STRING, day INT, amount BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gow2.web.t VALUES ('a', 1, 10), ('b', 2, 20), ('e', 3, 30)")
    Seq(("x", 2, 99L)).toDF("id", "day", "amount")
      .writeTo("gow2.web.t").overwrite(col("day") === 2)
    val rows = spark.table("gow2.web.t").orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("a", 1), ("e", 3), ("x", 2)),
      s"writeTo.overwrite must swap only day=2, got $rows")
    // DataSourceV2 contract (Iceberg's overwrite-by-filter): delete the
    // matching region, append the WHOLE batch — rows outside the region
    // land too (Delta's stricter every-row-must-match mode remains on
    // the direct replaceWhere API)
    Seq(("y", 2, 1L), ("z", 4, 2L)).toDF("id", "day", "amount")
      .writeTo("gow2.web.t").overwrite(col("day") === 2)
    val rows2 = spark.table("gow2.web.t").orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows2 == Seq(("a", 1), ("e", 3), ("y", 2), ("z", 4)),
      s"V2 overwrite must append the whole batch, got $rows2")
  }

  test("SQL INSERT OVERWRITE: static truncates, dynamic swaps partitions via SupportsDynamicOverwrite") {
    val wh = Files.createTempDirectory("ovw_sql").toString
    spark.conf.set("spark.sql.catalog.govw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.govw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS govw.web")
    spark.sql("CREATE TABLE govw.web.t (id STRING, day INT, amount BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO govw.web.t VALUES ('a', 1, 10), ('b', 2, 20), ('e', 3, 30)")
    // DYNAMIC: only the partitions the batch writes to are replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE govw.web.t VALUES ('x', 2, 99)")
      val rows = spark.table("govw.web.t").orderBy("id").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(rows == Seq(("a", 1), ("e", 3), ("x", 2)),
        s"dynamic overwrite must keep day=1/day=3, got $rows")
      // STATIC with a PARTITION clause: OverwriteByExpression(day=3) →
      // replaceWhere — only that partition's region is swapped
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      spark.sql("INSERT OVERWRITE govw.web.t PARTITION (day=3) VALUES ('E', 31)")
      val afterStatic = spark.table("govw.web.t").orderBy("id").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(afterStatic == Seq(("E", 3), ("a", 1), ("x", 2)),
        s"static partition overwrite must swap only day=3, got $afterStatic")
      // STATIC without a partition clause: full truncate-reload
      spark.sql("INSERT OVERWRITE govw.web.t VALUES ('z', 9, 1)")
      assert(spark.table("govw.web.t").count() == 1)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }
}
