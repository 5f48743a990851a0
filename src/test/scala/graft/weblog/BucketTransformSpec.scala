package graft.weblog

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The `bucket(n, col)` HIDDEN partition transform — Iceberg's
  * standard keyed layout (the reference's own table declares
  * `unique_keys ["user_id","timestamp"]`,
  * `web-analytics-iceberg/.example.cdk.context.json:22-24`, exactly
  * the shape Iceberg buckets): rows route to `pmod(xxhash64(col), n)`
  * leaves at write, and a point lookup `col = ?` hashes the literal to
  * exactly ONE leaf at read — the GDPR / user-history access pattern
  * where, at 100 TB, skipping (n−1)/n of the files IS the query.
  *
  * The soundness lines these tests pin:
  *  - a bucket value inverts to a HASH CLASS, not an interval — range
  *    predicates must never prune, and bucket predicates must never be
  *    declared handled (a leaf holds every value of its class, so
  *    whole-leaf decisions are not row-exact);
  *  - NULL sources land in the NULL leaf (never aliased into a real
  *    bucket);
  *  - the write-side hash must agree bit-for-bit with the read-side
  *    literal hash, or pruning would silently drop matching rows.
  */
class BucketTransformSpec extends SparkTestBase {

  private def users(n: Int): DataFrame = {
    import spark.implicits._
    // one task → one file per bucket leaf, so file counts == leaf counts
    (0 until n).map(i => (s"user-$i", i.toLong)).toDF("user_id", "v")
      .coalesce(1)
  }

  private def bucketTable(name: String, n: Int): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      partitionCol = "ub", partitionTransform = Some(s"bucket($n, user_id)"))

  test("writes route by xxhash64 and a point lookup prunes to one leaf") {
    val t = bucketTable("bt_point", 8)
    t.append(users(200))
    val all = t.filesFor(lit(true))
    val leaves = all.map(_.split('/').head).distinct
    assert(leaves.size > 1 && leaves.size <= 8,
      s"200 users should spread over several of 8 bucket leaves: $leaves")
    // every leaf ordinal is a real bucket id
    assert(leaves.forall(l =>
      l.stripPrefix("ub=").toIntOption.exists(b => b >= 0 && b < 8)))
    // the leaf each row landed in IS pmod(xxhash64(user_id), 8)
    import spark.implicits._
    val expected = users(200)
      .select(col("user_id"), pmod(xxhash64(col("user_id")), lit(8L)).as("b"))
      .as[(String, Long)].collect().toMap
    for (u <- Seq("user-0", "user-7", "user-42", "user-199")) {
      val files = t.filesFor(col("user_id") === u)
      assert(files.size == 1,
        s"a point lookup must prune to exactly one file, got $files for $u")
      assert(files.head.startsWith(s"ub=${expected(u)}/"),
        s"$u must prune to ITS bucket leaf ${expected(u)}, got ${files.head}")
      val rows = t.readWhere(col("user_id") === u).collect()
      assert(rows.length == 1 && rows.head.getAs[String]("user_id") == u)
    }
    // IN-list pruning: the union of the members' buckets
    val inBuckets = Seq("user-1", "user-2", "user-3").map(expected).distinct
    val inFiles = t.filesFor(col("user_id").isin("user-1", "user-2", "user-3"))
    assert(inFiles.map(_.split('/').head).distinct.sorted ==
      inBuckets.map(b => s"ub=$b").sorted)
    assert(t.readWhere(
      col("user_id").isin("user-1", "user-2", "user-3")).count() == 3)
  }

  test("range predicates never prune; bucket predicates stay residual (not handled)") {
    val t = bucketTable("bt_range", 4)
    t.append(users(100))
    val all = t.filesFor(lit(true)).toSet
    // a hash class is not an interval: inequalities keep every file...
    assert(t.filesFor(col("user_id") >= "user-5").toSet == all)
    // ...and still answer exactly (Spark re-applies the residual)
    assert(t.readWhere(col("user_id") >= "user-5").count() ==
      (0 until 100).count(i => s"user-$i" >= "user-5"))
    // equality is PRUNING-only, never handled: the exact filter probe
    // must refuse it (a leaf holds every value of its hash class)
    assert(!t.exactFilterProbe(
      org.apache.spark.sql.sources.EqualTo("user_id", "user-5")),
      "bucket predicates must never be declared row-exact")
    // a literal absent from the data still reads empty through the
    // pruned (possibly single-file) plan
    assert(t.readWhere(col("user_id") === "no-such-user").count() == 0)
  }

  test("NULL sources land in the null leaf and never alias a real bucket") {
    import spark.implicits._
    val t = bucketTable("bt_null", 4)
    t.append(Seq(("user-1", 1L), (null, 2L), (null, 3L))
      .toDF("user_id", "v").coalesce(1))
    val leaves = t.filesFor(lit(true)).map(_.split('/').head).distinct
    assert(leaves.contains("ub=__HIVE_DEFAULT_PARTITION__"),
      s"null user_ids must land in the null leaf: $leaves")
    assert(t.readWhere(col("user_id").isNull).count() == 2)
    assert(t.readWhere(col("user_id").isNotNull).count() == 1)
    // a point lookup never touches the null leaf (its rows are NULL)
    val files = t.filesFor(col("user_id") === "user-1")
    assert(files.forall(!_.startsWith("ub=__HIVE")),
      s"a point lookup must not keep the null leaf: $files")
  }

  test("multi(days, bucket): time slices and point lookups prune composably") {
    import spark.implicits._
    def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("bt_multi").toString + "/t",
      partitionCol = "pd",
      partitionTransform = Some("multi(days(ts), bucket(4, user_id))"))
    val df = (1 to 3).flatMap(d => (0 until 40).map(i =>
      (s"user-$i", ts(d)))).toDF("user_id", "ts").coalesce(1)
    t.append(df)
    val all = t.filesFor(lit(true))
    val day2 = col("ts") >= lit(ts(2)) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-03 00:00:00"))
    // the time leg prunes to day 2's buckets
    val day2Files = t.filesFor(day2)
    assert(day2Files.nonEmpty && day2Files.size < all.size)
    assert(t.readWhere(day2).count() == 40)
    // the bucket leg prunes independently: one bucket per day
    val pointFiles = t.filesFor(col("user_id") === "user-7")
    assert(pointFiles.size == 3, // one bucket leaf per of the 3 days
      s"a point lookup on the bucket leg keeps one leaf per day: $pointFiles")
    // and TOGETHER: one file
    assert(t.filesFor(day2 && col("user_id") === "user-7").size == 1)
    assert(t.readWhere(day2 && col("user_id") === "user-7").count() == 1)
  }

  test("manifest-only COUNT(*) still answers on a bucket layout") {
    val t = bucketTable("bt_count", 4)
    t.append(users(60))
    t.append(users(60)) // second commit, same shape
    assert(t.rowCountWhere(lit(true)).contains(120L),
      "an unfiltered count must answer from the manifest on a bucket table")
  }

  test("zero-task day aggregates survive the (days, bucket) layout") {
    // the bucket leg aligns as an Opaque AggLeg: COUNT(*) and
    // day-grouped counts still answer from the manifest on the
    // canonical fact layout — bucketing must not cost the dashboards
    val wh = Files.createTempDirectory("bt_zt_wh").toString
    spark.conf.set("spark.sql.catalog.gbzt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbzt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbzt.web")
    spark.sql("""CREATE TABLE gbzt.web.ev (user_id STRING, ts TIMESTAMP)
                |PARTITIONED BY (days(ts), bucket(4, user_id))""".stripMargin)
    import spark.implicits._
    (1 to 3).flatMap(d => (0 until 20).map(i =>
        (s"u$i", java.sql.Timestamp.valueOf(f"2024-03-$d%02d 08:00:00"))))
      .toDF("user_id", "ts").coalesce(1)
      .createOrReplaceTempView("gbzt_src")
    spark.sql("INSERT INTO gbzt.web.ev SELECT * FROM gbzt_src")
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(qs.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case _ => Nil
      })
    def zeroTask(q: org.apache.spark.sql.DataFrame): Boolean = {
      q.collect()
      nodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    val qCnt = spark.sql("SELECT CAST(count(*) AS BIGINT) FROM gbzt.web.ev")
    assert(qCnt.head.getLong(0) == 60L)
    assert(zeroTask(qCnt), "COUNT(*) must stay a manifest lookup")
    val qDay = spark.sql("""SELECT CAST(ts AS DATE) AS d,
                           |CAST(count(*) AS BIGINT) AS c
                           |FROM gbzt.web.ev GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(qDay.collect().map(_.getLong(1)).toSeq == Seq(20L, 20L, 20L))
    assert(zeroTask(qDay),
      "day grouping must answer from metadata despite the bucket leg")
  }

  test("spec evolution days→bucket: per-epoch point pruning, both eras exact") {
    import spark.implicits._
    def ts(day: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    val t0 = IcebergLikeTable(spark,
      Files.createTempDirectory("bt_evo").toString + "/t",
      partitionCol = "pb", partitionTransform = Some("days(ts)"))
    val oldEra = (1 to 2).flatMap(d => (0 until 30).map(i =>
      (s"user-$i", ts(d)))).toDF("user_id", "ts").coalesce(1)
    t0.append(oldEra)
    val t = t0.evolvePartitionSpec("bucket(4, user_id)")
    val newEra = (0 until 30).map(i => (s"user-$i", ts(3)))
      .toDF("user_id", "ts").coalesce(1)
    t.append(newEra)
    assert(t.read.count() == 90)
    // a point lookup decides each file under ITS epoch's spec: old-era
    // day leaves can't answer a user predicate (kept — sound), new-era
    // bucket leaves prune to the one matching bucket
    val pointFiles = t.filesFor(col("user_id") === "user-7")
    assert(pointFiles.size == 2 + 1,
      s"2 old-era day files (unprunable) + 1 new-era bucket file: $pointFiles")
    assert(t.readWhere(col("user_id") === "user-7").count() == 3)
    // the OLD epoch's time pruning still works mid-migration: day 2's
    // old-era leaf drops; the new-era BUCKET leaves cannot answer a
    // time predicate (a hash class spans every ts) and are kept — sound
    val day1 = col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00"))
    val day1Files = t.filesFor(day1)
    assert(day1Files.size == 1 + 4 &&
      !day1Files.exists(_.startsWith("pb=19784")),
      s"old-era day-2 leaf must prune; bucket leaves stay: $day1Files")
    assert(t.readWhere(day1).count() == 30)
    // migrate + collapse: the whole table requalifies for bucket pruning
    t.maintain(fileThreshold = 0)
    val afterFiles = t.filesFor(col("user_id") === "user-7")
    assert(afterFiles.map(_.split('/').head).distinct.size == 1,
      s"post-collapse the whole table prunes to one bucket leaf: $afterFiles")
    assert(t.readWhere(col("user_id") === "user-7").count() == 3)
  }

  test("MOR deletes compose with the bucket layout: masked reads + point pruning") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("bt_mor").toString + "/t",
      partitionCol = "ub", partitionTransform = Some("bucket(4, user_id)"))
    t.append((0 until 80).map(i => (s"user-$i", i.toLong))
      .toDF("user_id", "v").coalesce(1))
    // positional MOR delete: tombstones live, data files untouched
    val dataBefore = t.files.filter(!col("is_delete")).count()
    val erased = t.deletePositional(col("v") % 10 === 3)
    assert(erased == 8)
    assert(t.files.filter(!col("is_delete")).count() == dataBefore,
      "positional MOR must not rewrite data files")
    assert(t.files.filter(col("is_delete")).count() > 0)
    assert(t.read.count() == 72)
    // point pruning still engages under live tombstones, and the
    // masked read is row-exact for both surviving and erased users
    val survivor = t.readWhere(col("user_id") === "user-7").collect()
    assert(survivor.length == 1 && survivor.head.getAs[Long]("v") == 7L)
    assert(t.readWhere(col("user_id") === "user-13").count() == 0,
      "an erased user's point lookup must read empty through the mask")
    val pf = t.filesFor(col("user_id") === "user-7")
    assert(pf.size == 1, s"point pruning must survive tombstones: $pf")
  }
}
