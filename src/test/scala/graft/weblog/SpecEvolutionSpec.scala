package graft.weblog

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Partition-SPEC evolution (Iceberg's `ALTER TABLE .. SET PARTITION
  * SPEC`): a hidden-partitioned table switches its transform (e.g.
  * `days(ts)` → `hours(ts)`) in one metadata-only commit. Old files
  * stay in their old-spec leaves, new writes derive under the new
  * spec, and pruning inverts each file's partition value under the
  * spec that GOVERNED its write — inverting a day ordinal as if it
  * were an hour ordinal would synthesize bounds ~24× too early and
  * silently prune matching files (the unsoundness these tests pin).
  */
class SpecEvolutionSpec extends SparkTestBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:15:00")

  private def events(days: Range): DataFrame = {
    import spark.implicits._
    days.flatMap(d => (0 until 4).map(h =>
      (s"u$d-$h", s"e$d$h", ts(d, h * 6)))).toDF("user_id", "event_id", "ts")
  }

  private def daysTable(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))

  test("evolve days→hours: metadata-only, both eras read, new writes derive hourly") {
    val t0 = daysTable("se_basic")
    for (d <- 1 to 3) t0.append(events(d to d).coalesce(1))
    val filesBefore = t0.filesFor(lit(true)).toSet
    val vBefore = t0.currentVersion.get

    val t = t0.evolvePartitionSpec("hours(ts)")
    // metadata-only: same files, one new version, no data movement
    assert(t.currentVersion.contains(vBefore + 1))
    assert(t.filesFor(lit(true)).toSet == filesBefore)
    assert(t.read.count() == 12)

    // new writes land in HOUR leaves; old files stay in day leaves
    t.append(events(4 to 4).coalesce(4))
    assert(t.read.count() == 16)
    assert(t.read.columns.toSet == Set("user_id", "event_id", "ts"))
    val leaves = t.filesFor(lit(true)).map(_.split('/').head).distinct
    val dayOrdinal3 = ts(3, 0).getTime / 86400000L // close enough to pick eras apart
    val (small, big) = leaves.map(_.stripPrefix("pday=").toLong)
      .partition(_ < dayOrdinal3 + 100)
    assert(small.size == 3, s"3 day-era leaves expected: ${leaves.mkString(",")}")
    assert(big.size == 4, s"4 hour-era leaves expected: ${leaves.mkString(",")}")
  }

  test("evolve days→multi(days, identity): per-epoch inversion, per-leg pruning on the new era") {
    import spark.implicits._
    val t0 = IcebergLikeTable(spark,
      Files.createTempDirectory("se_multi").toString + "/t",
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    def tagged(d: Int, tag: String) = (0 until 4).map(h =>
      (s"u$d-$h", tag, ts(d, h * 6))).toDF("user_id", "tag", "ts")
    for (d <- 1 to 2) t0.append(tagged(d, "a").coalesce(1))
    val t = t0.evolvePartitionSpec("multi(days(ts), identity(tag))")
    for (d <- 3 to 4; tag <- Seq("a", "b"))
      t.append(tagged(d, tag).coalesce(1))
    assert(t.read.count() == 8 + 16)
    // a day predicate prunes BOTH eras under their own specs
    val day3 = col("ts") >= lit(ts(3, 0)) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-04 00:00:00"))
    val day3Files = t.filesFor(day3)
    assert(day3Files.size == 2, s"day-3 slice: 2 new-era files, got $day3Files")
    assert(t.readWhere(day3).count() == 8)
    // the identity leg prunes only where it GOVERNS: old-era files
    // cannot answer a tag predicate (sound: they are kept), new-era
    // files skip the other tag
    val tagB = t.filesFor(col("tag") === "b")
    assert(tagB.size == 2 + 2, // 2 old-era (unprunable) + 2 new-era b files
      s"tag=b: old era kept + new-era b, got $tagB")
    assert(t.readWhere(col("tag") === "b").count() == 8)
    // a day-1 predicate prunes to the single old-era file
    val day1 = col("ts") < lit(Timestamp.valueOf("2024-03-02 00:00:00"))
    assert(t.filesFor(day1).size == 1)
    assert(t.readWhere(day1).count() == 4)
  }

  test("pruning inverts each file under its own epoch (old files not mis-pruned)") {
    val t0 = daysTable("se_prune")
    for (d <- 1 to 3) t0.append(events(d to d).coalesce(1))
    val t = t0.evolvePartitionSpec("hours(ts)")
    for (d <- 4 to 5) t.append(events(d to d).coalesce(4))

    // a slice over the OLD era: naive inversion of the day ordinal
    // under hours(ts) would bound these files in 1972 and prune them
    val day2 = col("ts") >= lit(ts(2, 0)) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-03 00:00:00"))
    assert(t.readWhere(day2).count() == 4, "old-era rows lost to mis-pruning")
    assert(t.filesFor(day2).size == 1, "day slice must plan exactly the day-2 file")

    // a slice over the NEW era prunes at hour granularity
    val h0 = col("ts") >= lit(Timestamp.valueOf("2024-03-04 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-04 06:00:00"))
    assert(t.readWhere(h0).count() == 1)
    assert(t.filesFor(h0).size == 1, "hour slice must plan exactly one hour file")

    // a slice spanning the epoch boundary reads both eras
    val span = col("ts") >= lit(ts(3, 0)) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-04 19:15:00"))
    assert(t.readWhere(span).count() == 8)
    assert(t.filesFor(span).size == 1 + 4, "one day file + day-4's four hour files")

    // full scan unchanged
    assert(t.read.count() == 20)
  }

  test("maintain(0) migrates old files to the new spec and collapses the history") {
    val t0 = daysTable("se_migrate")
    for (d <- 1 to 3) t0.append(events(d to d).coalesce(1))
    val t = t0.evolvePartitionSpec("hours(ts)")
    t.append(events(4 to 4).coalesce(4))

    // multi-epoch: branching refuses (branch version numbering cannot
    // disambiguate epochs)
    intercept[IllegalArgumentException](t.createBranch("audit"))

    t.maintain(fileThreshold = 0)
    // every live file now sits in an hour-ordinal leaf
    val leaves = t.filesFor(lit(true)).map(_.split('/').head)
      .map(_.stripPrefix("pday=").toLong)
    assert(leaves.forall(_ > 400000L),
      s"day-era leaves survived the migration: ${leaves.mkString(",")}")
    assert(t.read.count() == 16)

    // pruning is now hour-sharp over the migrated era too
    val h1 = col("ts") >= lit(Timestamp.valueOf("2024-03-02 06:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-02 07:00:00"))
    assert(t.filesFor(h1).size == 1)
    assert(t.readWhere(h1).count() == 1)

    // the history collapsed to one epoch: branching re-opens
    val b = t.createBranch("audit")
    assert(b.read.count() == 16)
  }

  test("guards: keyed, same-spec, untransformed, stale handle, live branches") {
    import spark.implicits._
    // keyed tables pin their spec (merge routes by the derived leaf)
    val keyed = IcebergLikeTable(spark,
      Files.createTempDirectory("se_keyed").toString + "/t",
      partitionCol = "pday", uniqueKeys = Seq("k"), numBuckets = 2,
      partitionTransform = Some("days(ts)"))
    intercept[IllegalArgumentException](keyed.evolvePartitionSpec("hours(ts)"))

    // no transform declared → nothing to evolve
    val plain = IcebergLikeTable(spark,
      Files.createTempDirectory("se_plain").toString + "/t", "event")
    intercept[IllegalArgumentException](plain.evolvePartitionSpec("days(ts)"))

    val t0 = daysTable("se_guard")
    t0.append(events(1 to 1))
    intercept[IllegalArgumentException](t0.evolvePartitionSpec("days(ts)"))

    // live branches block evolution
    t0.createBranch("wip")
    intercept[IllegalArgumentException](t0.evolvePartitionSpec("hours(ts)"))
    t0.dropBranch("wip")

    val t = t0.evolvePartitionSpec("hours(ts)")
    // the pre-evolve handle fails the layout check on its next commit
    intercept[IllegalArgumentException](t0.append(events(2 to 2)))
    t.append(events(2 to 2))
    assert(t.read.count() == 8)
  }

  test("time travel prunes under the historical spec; rollback restores it") {
    val t0 = daysTable("se_travel")
    for (d <- 1 to 2) t0.append(events(d to d).coalesce(1))
    val vOld = t0.currentVersion.get
    val t = t0.evolvePartitionSpec("hours(ts)")
    t.append(events(3 to 3).coalesce(4))

    // a read AT the pre-evolve snapshot sees only the old era, pruned
    // under the old spec
    val day1 = col("ts") >= lit(ts(1, 0)) && col("ts") < lit(ts(2, 0))
    assert(t.readWhereAt(vOld, day1).count() == 4)
    assert(t.readAt(vOld).count() == 8)

    // rollback across the evolve: the old spec is live again — the
    // evolved handle is now stale, the original declaration commits
    t.rollbackTo(vOld)
    intercept[IllegalArgumentException](t.append(events(4 to 4)))
    t0.append(events(4 to 4).coalesce(1))
    assert(t0.read.count() == 12)
    val leaves = t0.filesFor(lit(true)).map(_.split('/').head)
      .map(_.stripPrefix("pday=").toLong)
    assert(leaves.forall(_ < 400000L),
      s"rollback must restore day-ordinal layout: ${leaves.mkString(",")}")
  }

  test("positional MOR delete stays row-identical across an evolved table") {
    val t0 = daysTable("se_mor")
    for (d <- 1 to 2) t0.append(events(d to d).coalesce(1))
    val t = t0.evolvePartitionSpec("hours(ts)")
    t.append(events(3 to 3).coalesce(4))

    // delete one old-era row and one new-era row by source predicate
    val erased = t.deletePositional(col("user_id").isin("u1-1", "u3-2"))
    assert(erased == 2L)
    assert(t.read.count() == 10)
    assert(t.read.filter(col("user_id").isin("u1-1", "u3-2")).count() == 0)
    // tombstones landed beside the files they mask, in BOTH eras
    val delLeaves = t.files.filter(col("is_delete")).select("file")
      .collect().map(_.getString(0).split('/').head
        .stripPrefix("pday=").toLong).distinct
    assert(delLeaves.exists(_ < 400000L) && delLeaves.exists(_ > 400000L),
      s"expected tombstones in both eras: ${delLeaves.mkString(",")}")
    // compaction consumes them; the row set is stable
    t.maintain(fileThreshold = 1000, deleteFileThreshold = 1)
    assert(t.read.count() == 10)
  }

  test("post-collapse requalification: leaf-exact metadata decisions return after maintain(0) (r13)") {
    val t0 = daysTable("se_requal")
    for (d <- 1 to 3) t0.append(events(d to d).coalesce(1))
    val t = t0.evolvePartitionSpec("hours(ts)")
    t.append(events(4 to 4).coalesce(1))
    val slice = col("ts") >= lit(Timestamp.valueOf("2024-03-02 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-03 00:00:00"))
    // per-EPOCH decisions (r13): with BOTH epochs live, a day-aligned
    // slice decides each file under its own spec (day boundaries are
    // hour-aligned too) — the migration window keeps zero-task counts
    assert(t.rowCountWhere(slice).contains(4L),
      "a day-aligned slice must decide both epochs' files")
    assert(t.readWhere(slice).count() == 4L)
    // an hour-aligned-but-not-day-aligned boundary is undecidable for
    // the day-epoch files: refuses while they live (fallback pin)
    val odd = col("ts") >= lit(Timestamp.valueOf("2024-03-02 06:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-03 00:00:00"))
    assert(t.rowCountWhere(odd).isEmpty,
      "a boundary only the new spec decides must refuse while " +
        "day-epoch files live")
    assert(t.readWhere(odd).count() == 3L)
    // maintain(0) rewrites every file under the hours spec; the commit
    // collapses the history to ONE epoch and the table RE-QUALIFIES
    // for hour-aligned decisions too
    t.maintain(fileThreshold = 0)
    assert(t.rowCountWhere(slice).contains(4L),
      "a collapsed evolved table must answer whole-leaf counts from " +
        "metadata again")
    assert(t.rowCountWhere(odd).contains(3L),
      "post-collapse, hour-aligned slices decide every leaf")
  }

  test("multi-epoch metadata answers: per-epoch derivable legs answer, underivable fall back (r13)") {
    val wh = Files.createTempDirectory("se_me_wh").toString
    spark.conf.set("spark.sql.catalog.gsme", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsme.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsme.web")
    spark.sql("""CREATE TABLE gsme.web.ev (user_id STRING, event STRING, ts TIMESTAMP)
                |PARTITIONED BY (days(ts))""".stripMargin)
    import spark.implicits._
    (1 to 2).flatMap(d => (0 until 4).map(h =>
        (s"u$d-$h", s"e${h % 2}", ts(d, h * 6))))
      .toDF("user_id", "event", "ts").createOrReplaceTempView("gsme_src")
    spark.sql("INSERT INTO gsme.web.ev SELECT * FROM gsme_src")
    spark.sql("""CALL gsme.system.evolve_partition_spec(
                |  `table` => 'web.ev', spec => 'multi(days(ts), identity(event))')""".stripMargin)
    (3 to 3).flatMap(d => (0 until 4).map(h =>
        (s"u$d-$h", s"e${h % 2}", ts(d, h * 6))))
      .toDF("user_id", "event", "ts").createOrReplaceTempView("gsme_src3")
    spark.sql("INSERT INTO gsme.web.ev SELECT * FROM gsme_src3")
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(qs.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case _ => Nil
      })
    def isLocal(q: org.apache.spark.sql.DataFrame): Boolean = {
      q.collect()
      nodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // BOTH epochs live. The day leg is derivable in BOTH specs
    // (days(ts) aligns with the multi's days(ts) leg), so day-grouped
    // counts answer from the manifest during the migration
    val qDay = spark.sql("""SELECT CAST(ts AS DATE) AS d,
                           |       CAST(count(*) AS BIGINT) AS c
                           |FROM gsme.web.ev GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(qDay.collect().map(_.getLong(1)).toSeq == Seq(4L, 4L, 4L))
    assert(isLocal(qDay),
      s"day grouping must answer from metadata across epochs:\n" +
        s"${qDay.queryExecution.executedPlan}")
    // a day-aligned handled filter decides each file under ITS spec
    val qCnt = spark.sql(
      """SELECT CAST(count(*) AS BIGINT) AS c FROM gsme.web.ev
        |WHERE ts < TIMESTAMP '2024-03-02 00:00:00'""".stripMargin)
    assert(qCnt.head.getLong(0) == 4L)
    assert(isLocal(qCnt),
      "a day-aligned count must stay zero-task during the migration")
    // the event leg does NOT exist in the old epoch: GROUP BY event
    // falls back to a real scan and still answers correctly
    val qEvt = spark.sql("""SELECT event, CAST(count(*) AS BIGINT) AS c
                           |FROM gsme.web.ev GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(qEvt.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("e0", 6L), ("e1", 6L)))
    assert(!isLocal(qEvt),
      "an underivable leg must fall back while old-epoch files live")
    // engine-level: the same per-epoch decisions serve rowCountWhere
    // and the METADATA DELETE — a retention slice stays one
    // subtractive manifest commit DURING the migration
    val handle = IcebergLikeTable(spark, s"$wh/web/ev",
      partitionCol = "ts_day",
      partitionTransform = Some("multi(days(ts), identity(event))"))
    val slice = col("ts") >= lit(Timestamp.valueOf("2024-03-01 00:00:00")) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-02 00:00:00"))
    assert(handle.rowCountWhere(slice).contains(4L),
      "rowCountWhere must answer per epoch on a multi-epoch snapshot")
    val dataBefore = handle.files.filter(!col("is_delete")).count()
    assert(handle.delete(slice) == 4L)
    val dataAfter = handle.files.filter(!col("is_delete")).count()
    assert(dataAfter < dataBefore &&
      handle.files.filter(col("is_delete")).count() == 0L,
      "the migration-window retention DELETE must be metadata-only")
    assert(spark.sql("SELECT count(*) FROM gsme.web.ev").head.getLong(0) == 8L)
  }

  test("boundary sweep: every per-epoch metadata answer equals the real scan (r13)") {
    // a mixed-epoch days→hours table, swept across day-aligned,
    // hour-aligned and unaligned boundaries in both directions: every
    // boundary where rowCountWhere ANSWERS must equal the scan, and
    // the answered set must include all day-aligned slices (the
    // migration-window guarantee)
    val t0 = daysTable("se_sweep")
    for (d <- 1 to 3) t0.append(events(d to d).coalesce(1))
    val t = t0.evolvePartitionSpec("hours(ts)")
    t.append(events(4 to 5).coalesce(2))
    var answered = 0
    for {
      day <- 1 to 5
      hour <- Seq(0, 6, 12, 13)
      op <- Seq("lt", "ge")
    } {
      val b = Timestamp.valueOf(f"2024-03-0$day $hour%02d:00:00")
      val cond = if (op == "lt") col("ts") < lit(b) else col("ts") >= lit(b)
      val expected = t.readWhere(cond).count()
      t.rowCountWhere(cond) match {
        case Some(n) =>
          answered += 1
          assert(n == expected,
            s"metadata answer diverged at $op $b: $n vs $expected")
        case None =>
          // refusals must only happen where the OLD epoch genuinely
          // cannot decide: a non-day-aligned boundary
          assert(hour != 0,
            s"a day-aligned boundary must answer during the migration: $op $b")
      }
    }
    assert(answered >= 10, s"sweep answered only $answered boundaries")
  }

  test("time travel to a pre-evolution snapshot decides leaves under ITS OWN spec (r13)") {
    val wh = Files.createTempDirectory("se_tt_wh").toString
    spark.conf.set("spark.sql.catalog.gsevo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsevo.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsevo.web")
    spark.sql("""CREATE TABLE gsevo.web.tt (user_id STRING, ts TIMESTAMP)
                |PARTITIONED BY (days(ts))""".stripMargin)
    import spark.implicits._
    (1 to 2).flatMap(d => (0 until 4).map(h => (s"u$d-$h", ts(d, h * 6))))
      .toDF("user_id", "ts").createOrReplaceTempView("gsevo_src")
    spark.sql("INSERT INTO gsevo.web.tt SELECT * FROM gsevo_src")
    val handle = IcebergLikeTable(spark, s"$wh/web/tt",
      partitionCol = "ts_day", partitionTransform = Some("days(ts)"))
    val v1 = handle.currentVersion.get
    // evolve to hours and MIGRATE (collapse): the live spec is now a
    // single-entry HOURS history, but snapshot v1's leaves are day
    // ordinals — a day ordinal decoded as an hour ordinal (~24× too
    // small) would keep EVERY leaf and silently answer 8 instead of 4
    spark.sql("""CALL gsevo.system.evolve_partition_spec(
                |  `table` => 'web.tt', spec => 'hours(ts)')""".stripMargin)
    spark.sql("CALL gsevo.system.maintain(`table` => 'web.tt', file_threshold => 0)")
    val q = spark.sql(
      """SELECT CAST(count(*) AS BIGINT) AS c FROM gsevo.web.tt
        |VERSION AS OF %d
        |WHERE ts < TIMESTAMP '2024-03-02 00:00:00'""".stripMargin.format(v1))
    assert(q.head.getLong(0) == 4L,
      "the pinned snapshot must decide its day-ordinal leaves under " +
        "the days() spec it was written with")
    // and the answer comes from the manifest (zero tasks): the pinned
    // snapshot's own spec qualifies the handled filter + the pushdown
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(qs.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case _ => Nil
      })
    assert(nodes(q.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      s"pinned pre-evolution aggregate must answer from metadata:\n" +
        s"${q.queryExecution.executedPlan}")
    // the LIVE table answers from metadata too (post-collapse
    // requalification through the SQL surface)
    val qLive = spark.sql(
      """SELECT CAST(count(*) AS BIGINT) AS c FROM gsevo.web.tt
        |WHERE ts < TIMESTAMP '2024-03-02 00:00:00'""".stripMargin)
    assert(qLive.head.getLong(0) == 4L)
    assert(nodes(qLive.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec]),
      "a collapsed evolved table must re-qualify for zero-task counts")
  }

  test("whole-null old-epoch leaf refuses a later-added identity leg (r14)") {
    // The unsoundness this pins: a days(ts) NULL leaf proves only that
    // ts IS NULL — it says NOTHING about an identity leg (event) a
    // LATER spec adds. Pre-fix, the DEFAULT_PARTITION_NAME leaf
    // short-circuited to all-None for the CURRENT legs, so when every
    // live old-epoch file sat in the null leaf, GROUP BY event
    // answered from metadata and silently parked those rows' real
    // event values under the NULL group.
    val wh = Files.createTempDirectory("se_null_wh").toString
    spark.conf.set("spark.sql.catalog.gsnul", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsnul.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsnul.web")
    spark.sql("""CREATE TABLE gsnul.web.ev (user_id STRING, event STRING, ts TIMESTAMP)
                |PARTITIONED BY (days(ts))""".stripMargin)
    import spark.implicits._
    // old epoch: ONLY null-ts rows — all land in the whole-null leaf,
    // and their event values are real ('view'/'click')
    Seq(("u1", "view", null), ("u2", "click", null), ("u3", "view", null))
      .toDF("user_id", "event", "ts")
      .select(col("user_id"), col("event"), col("ts").cast("timestamp"))
      .createOrReplaceTempView("gsnul_src")
    spark.sql("INSERT INTO gsnul.web.ev SELECT * FROM gsnul_src")
    spark.sql("""CALL gsnul.system.evolve_partition_spec(
                |  `table` => 'web.ev', spec => 'multi(days(ts), identity(event))')""".stripMargin)
    (3 to 3).flatMap(d => (0 until 4).map(h =>
        (s"u$d-$h", s"e${h % 2}", ts(d, h * 6))))
      .toDF("user_id", "event", "ts").createOrReplaceTempView("gsnul_src3")
    spark.sql("INSERT INTO gsnul.web.ev SELECT * FROM gsnul_src3")
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(nodes)) ++ (p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(qs.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case _ => Nil
      })
    def isLocal(q: org.apache.spark.sql.DataFrame): Boolean = {
      q.collect()
      nodes(q.queryExecution.executedPlan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    }
    // GROUP BY event must FALL BACK (the null leaf cannot derive the
    // event leg) and answer the rows' REAL event values
    val qEvt = spark.sql("""SELECT event, CAST(count(*) AS BIGINT) AS c
                           |FROM gsnul.web.ev GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(qEvt.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("click", 1L), ("e0", 2L), ("e1", 2L), ("view", 2L)),
      "null-leaf rows' real event values must survive the migration")
    assert(!isLocal(qEvt),
      "a whole-null old-epoch leaf must refuse a later-added identity leg")
    // the DAY leg is derivable in both epochs (null leaf ⇒ ts IS NULL
    // ⇒ date NULL): day grouping keeps the zero-task answer
    val qDay = spark.sql("""SELECT CAST(ts AS DATE) AS d,
                           |       CAST(count(*) AS BIGINT) AS c
                           |FROM gsnul.web.ev GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)
    assert(qDay.collect().map(_.getLong(1)).toSeq == Seq(3L, 4L),
      "NULL day group must carry exactly the null-leaf rows")
    assert(isLocal(qDay),
      "the derivable day leg must keep zero-task answers mid-migration")
  }
}
