package graft.weblog

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ANALYZE — the metadata-only statistics backfill (Iceberg's
  * compute-stats): one pass over the live data commits fresh per-file
  * row counts, [min, max] bounds, NULL counts and NDV sketches under
  * the SAME data paths. A table created without `statsColumns` (or
  * before stamping existed) gains bounds pruning, manifest-only
  * aggregates and CBO column statistics after the fact, without
  * rewriting a byte of data.
  */
class AnalyzeSpec extends SparkTestBase {

  test("analyze backfills bounds/NDV/nulls on an unstamped table — data files untouched") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("an_t").toString + "/t", "day")
    // no statsColumns declared: commits stamp row counts but no column
    // stats — bounds pruning and manifest aggregates are blind to k
    for (d <- 1 to 3)
      t.append((0 until 100).map(i =>
        (d * 1000L + i, if (i % 4 == 0) null else s"n$i", d))
        .toDF("k", "name", "day"))
    val total = t.filesFor(lit(true)).size
    assert(t.filesFor(col("k") === 1001L).size == total,
      "without stamps, a k-predicate must prune nothing")
    assert(t.columnMinMax("k").isEmpty)
    val dataBefore = t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    val preVersion = t.currentVersion.get

    val v = t.analyze(Seq("k", "name"))
    assert(v == preVersion + 1)
    // metadata-only: the data file set is IDENTICAL
    val dataAfter = t.files.filter(!col("is_delete"))
      .select("file").collect().map(_.getString(0)).toSet
    assert(dataAfter == dataBefore, "analyze must not touch data files")
    // bounds pruning now works: k=1001 lives in day 1's file only
    val hit = t.filesFor(col("k") === 1001L).size
    assert(hit < total && hit >= 1, s"analyzed bounds must prune: $hit of $total")
    // manifest-only min/max now answers
    assert(t.columnMinMax("k").contains(("1000", "3099")))
    // rows unchanged, census identical across the analyze commit
    assert(t.read.count() == 300L)
    assert(t.readAt(preVersion).count() == 300L)
    // the stamps carry NDV + null counts (NULL name every 4th row →
    // 75 nulls total across the 3 days, however many files each
    // append produced)
    val (_, snap) = t.resolveLive()
    assert(snap.dataEntries.forall(e =>
      e.ndv.contains("k") && e.nulls.contains("name")))
    assert(snap.dataEntries.map(_.nulls("name")).sum == 75L)
  }

  test("analyze repairs a legacy unstamped row count — manifest-only count(*) lights up") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("an_legacy").toString + "/t", "day")
    t.append((0 until 50).map(i => (i.toLong, 1)).toDF("k", "day"))
    // doctor the live manifest: strip one entry's row count (and all
    // stats) — the shape of a manifest written before stamping existed
    val root = new Path(t.path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (v0, snap0) = t.resolveLive()
    val stripped = snap0.entries.map(e =>
      e.copy(rowCount = -1L, stats = Map.empty, nulls = Map.empty,
        ndv = Map.empty))
    val leafName = s"${Manifests.LeafPrefix}doctor_legacy"
    Manifests.writeLeafManifest(fs, root, leafName, stripped)
    Manifests.write(fs, root, v0 + 1,
      Seq(Manifests.RefMark + leafName), snap0.meta)
    assert(t.rowCount.isEmpty, "a -1 row count must refuse manifest counts")

    t.analyze(Seq("k"))
    assert(t.rowCount.contains(50L),
      "analyze must restore the manifest-only count")
    assert(t.columnMinMax("k").contains(("0", "49")))
    assert(t.read.count() == 50L)
  }

  test("analyze backfills Bloom sidecars: point lookups prune files the bounds cannot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("an_bloom").toString + "/t"
    // written WITHOUT bloom columns: the three files' k ranges overlap
    // completely (interleaved residues), so bounds can never prune a
    // point lookup — only a Bloom can
    val plain = IcebergLikeTable(spark, dir, "day")
    for (r <- 0 to 2)
      plain.append((0 until 100).map(i => (i.toLong * 3 + r, 1))
        .toDF("k", "day"))
    val t = IcebergLikeTable(spark, dir, "day", bloomColumns = Seq("k"))
    val total = t.filesFor(org.apache.spark.sql.functions.lit(true)).size
    assert(t.filesFor(col("k") === 4L).size == total,
      "pre-analyze point lookups must scan everything")
    t.analyze(Seq("k"))
    // k=4 has residue 1: only residue-1 files can contain it (modulo
    // the 1% false-positive rate — strictly fewer than all files)
    val hit = t.filesFor(col("k") === 4L).size
    assert(hit < total && hit >= 1,
      s"analyzed Bloom must prune the point lookup: $hit of $total")
    assert(t.readWhere(col("k") === 4L).count() == 1L)
    // the backfilled sidecar SURVIVES later commits (whole-table
    // coverage carries; only a newer analyze supersedes it)
    t.append(Seq((1000L, 2)).toDF("k", "day"))
    val hit2 = t.filesFor(col("k") === 4L).size
    assert(hit2 <= hit + 1,
      s"the analyze sidecar must carry across commits: $hit2")
    assert(t.readWhere(col("k") === 4L).count() == 1L)
  }

  test("CALL g.system.analyze backfills through SQL and the pushed aggregate goes zero-task") {
    val wh = Files.createTempDirectory("an_sql").toString
    spark.conf.set("spark.sql.catalog.gan", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gan.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gan.web")
    // created WITHOUT statsColumns: min/max cannot push before analyze
    spark.sql("CREATE TABLE gan.web.ev (uid BIGINT, day INT) PARTITIONED BY (day)")
    spark.sql("INSERT INTO gan.web.ev SELECT id, CAST(id % 3 AS INT) FROM range(90)")
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case _ => Nil
      })
    def zeroTask(sql: String): Boolean = {
      val q = spark.sql(sql)
      q.collect()
      nodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    assert(!zeroTask("SELECT min(uid), max(uid) FROM gan.web.ev"),
      "unstamped bounds must scan")
    val res = spark.sql(
      "CALL gan.system.analyze(`table` => 'web.ev', columns => 'uid')")
    assert(res.collect().head.getLong(0) >= 2L)
    assert(zeroTask("SELECT min(uid), max(uid) FROM gan.web.ev"),
      "analyzed bounds must answer from the manifest")
    val r = spark.sql("SELECT min(uid) AS lo, max(uid) AS hi FROM gan.web.ev").head
    assert((r.getLong(0), r.getLong(1)) == ((0L, 89L)))
  }
}
