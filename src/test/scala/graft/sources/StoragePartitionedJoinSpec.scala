package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** STORAGE-PARTITIONED JOINS (Iceberg's SPJ): two keyed graft tables
  * bucketed the same way join on their keys WITHOUT a shuffle — the
  * native scan reports `bucket(n, keys)` KeyGroupedPartitioning, the
  * catalog's FunctionCatalog resolves the transform, and Spark matches
  * the two sides' partition values instead of exchanging 2× the data.
  * The bucket function MUST agree bit-for-bit with the write side's
  * routing hash or co-location would be a lie — pinned first.
  */
class StoragePartitionedJoinSpec extends SparkTestBase {

  private lazy val warehouse = Files.createTempDirectory("spj_wh").toString

  private def sql(q: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gspj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gspj.warehouse", warehouse)
    spark.sql(q)
  }

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case _ => Nil
    })

  test("the catalog bucket function agrees bit-for-bit with the write-side routing") {
    import spark.implicits._
    val bound = GraftBucketFunction.bind(new org.apache.spark.sql.types.StructType()
      .add("n", "int").add("k", "string"))
      .asInstanceOf[GraftBucketBound]
    val keys = (0 until 200).map(i => s"key-$i")
    val expected = keys.toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8L)).cast("int").as("b"))
      .collect().map(_.getInt(0))
    val actual = keys.map { k =>
      bound.produceResult(org.apache.spark.sql.catalyst.InternalRow(
        8, org.apache.spark.unsafe.types.UTF8String.fromString(k))).intValue
    }
    assert(actual.toSeq == expected.toSeq,
      "bucket() must equal pmod(xxhash64(k), n) exactly")
    // null keys hash like the write side too
    val nullExpected = spark.range(1)
      .select(pmod(xxhash64(lit(null).cast("string")), lit(8L)).cast("int"))
      .head.getInt(0)
    assert(bound.produceResult(org.apache.spark.sql.catalyst.InternalRow(
      8, null)).intValue == nullExpected)
  }

  test("co-bucketed keyed tables join on their keys with NO shuffle") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    for (t <- Seq("left_t", "right_t")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT, seq BIGINT)
             |TBLPROPERTIES (uniqueKeys 'id', numBuckets '8', orderCol 'seq')""".stripMargin)
      sql(s"""INSERT INTO gspj.web.$t
             |SELECT concat('k', id), id * ${if (t == "left_t") 1 else 100}, 1
             |FROM range(400)""".stripMargin)
    }
    val old = (
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.v + r.v) AS s
                    |FROM gspj.web.left_t l JOIN gspj.web.right_t r
                    |ON l.id = r.id""".stripMargin)
      val row = q.head
      assert(row.getLong(0) == 400L)
      // sum over id of (id + 100*id) = 101 * (0+..+399)
      assert(row.getLong(1) == 101L * (399L * 400L / 2))
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      // the join itself must be shuffle-free: the only exchange allowed
      // is the single-partition one under the final global aggregate
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"storage-partitioned join must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
      // row-level spot check across the co-located join
      val r = sql("""SELECT l.v, r.v FROM gspj.web.left_t l
                    |JOIN gspj.web.right_t r ON l.id = r.id
                    |WHERE l.id = 'k7'""".stripMargin).head
      assert((r.getLong(0), r.getLong(1)) == ((7L, 700L)))
    } finally {
      old._1.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      old._2.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  test("multi-file buckets (several commits) still key-group: the exec merges same-key partitions") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    for (t <- Seq("mleft", "mright")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT, seq BIGINT)
             |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq')""".stripMargin)
      // two commits ⇒ two file generations per bucket leaf; the scan
      // reports one partition PER FILE (what lets partially-clustered
      // distribution split a skewed side) and BatchScanExec groups
      // same-key partitions back for the plain SPJ
      sql(s"INSERT INTO gspj.web.$t SELECT concat('k', id), id, 1 FROM range(150)")
      sql(s"INSERT INTO gspj.web.$t SELECT concat('k', id), id, 1 FROM range(150, 300)")
    }
    val old = (
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.v - r.v) AS z
                    |FROM gspj.web.mleft l JOIN gspj.web.mright r
                    |ON l.id = r.id""".stripMargin)
      val row = q.head
      assert(row.getLong(0) == 300L && row.getLong(1) == 0L)
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"multi-file-bucket SPJ must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
    } finally {
      old._1.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      old._2.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  test("DIFFERENT bucket counts still join shuffle-free when one divides the other (ReducibleFunction)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    // 8-bucket vs 4-bucket: the layout hash is modulus-based, so
    // pmod(h, 8) % 4 == pmod(h, 4) — the 8-side's groups REDUCE into
    // the 4-side's space and the join still skips both exchanges (the
    // rebucket-grown table keeps SPJ against its old-sized peers)
    sql("""CREATE TABLE gspj.web.grown (id STRING, v BIGINT, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'id', numBuckets '8', orderCol 'seq')""".stripMargin)
    sql("INSERT INTO gspj.web.grown SELECT concat('k', id), id, 1 FROM range(300)")
    sql("""CREATE TABLE gspj.web.legacy (id STRING, v BIGINT, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq')""".stripMargin)
    sql("INSERT INTO gspj.web.legacy SELECT concat('k', id), id * 10, 1 FROM range(300)")
    val old = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(g.v + l.v) AS s
                    |FROM gspj.web.grown g JOIN gspj.web.legacy l
                    |ON g.id = l.id""".stripMargin)
      val row = q.head
      assert(row.getLong(0) == 300L)
      assert(row.getLong(1) == 11L * (299L * 300L / 2))
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"mixed-bucket-count SPJ must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("without the bucketing conf the scan keeps split parallelism and plain joins stay correct") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    sql("""CREATE TABLE gspj.web.plain (id STRING, v BIGINT, seq BIGINT)
          |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq')""".stripMargin)
    sql("INSERT INTO gspj.web.plain SELECT concat('k', id), id, 1 FROM range(100)")
    assert(sql("SELECT sum(v) FROM gspj.web.plain").head.getLong(0) ==
      99L * 100L / 2)
  }

  test("SPJ survives live EQUALITY deletes: shuffle-free join over tombstoned tables (r11)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    // a key's surviving rows still live in exactly its bucket — masking
    // only removes rows — so the GDPR tombstones must not cost the
    // co-located join its shuffle-free plan (Trino keeps dynamic
    // filtering under deletes; this is the same posture for SPJ)
    for (t <- Seq("eql", "eqr")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT, seq BIGINT)
             |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq',
             |'write.delete.mode' 'merge-on-read')""".stripMargin)
      sql(s"""INSERT INTO gspj.web.$t
             |SELECT concat('k', id), id * ${if (t == "eql") 1 else 10}, 1
             |FROM range(200)""".stripMargin)
    }
    // tombstone DIFFERENT key ranges on each side: the join must see
    // only rows both masks keep (inner join semantics post-delete)
    sql("DELETE FROM gspj.web.eql WHERE v >= 150")
    sql("DELETE FROM gspj.web.eqr WHERE v < 100")  // ids 0..9
    val old = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.v + r.v) AS s
                    |FROM gspj.web.eql l JOIN gspj.web.eqr r
                    |ON l.id = r.id""".stripMargin)
      val row = q.head
      // survivors: left keeps ids 0..149, right keeps ids 10..199 —
      // the join sees 10..149
      assert(row.getLong(0) == 140L)
      assert(row.getLong(1) == 11L * (10L to 149L).sum)
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"SPJ under equality deletes must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("SPJ survives RENAME epochs: a renamed keyed table keeps its shuffle-free joins (r12)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    // bucket hashing is key-VALUE-based and keys are rename-immutable,
    // so a rename epoch cannot move a key across buckets — each
    // single-file partition reads under its own epoch's physical names
    for (t <- Seq("rnl", "rnr")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT, seq BIGINT)
             |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4',
             |orderCol 'seq',
             |'write.delete.mode' 'merge-on-read')""".stripMargin)
      sql(s"""INSERT INTO gspj.web.$t
             |SELECT concat('k', id), id * ${if (t == "rnl") 1 else 10}, 1
             |FROM range(240)""".stripMargin)
    }
    // rename the LEFT side's value column mid-life: every stored file
    // predates the rename (physical 'v' serves logical 'w' through the
    // epoch factory), and a post-rename GDPR tombstone composes
    sql("ALTER TABLE gspj.web.rnl RENAME COLUMN v TO w")
    sql("DELETE FROM gspj.web.rnl WHERE w >= 220")
    val old = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.w + r.v) AS s
                    |FROM gspj.web.rnl l JOIN gspj.web.rnr r
                    |ON l.id = r.id""".stripMargin)
      val row = q.head
      // left keeps ids 0..219 (delete removed 220..239); right has all
      assert(row.getLong(0) == 220L)
      assert(row.getLong(1) == 11L * (0L to 219L).sum)
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"SPJ under a rename epoch must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("SPJ survives live POSITIONAL deletes: skip lists ride the key-grouped partitions (r13)") {
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    // a positional skip list names (file, ordinal) tuples — it can only
    // ever REMOVE rows of the one file it addresses, never move a key
    // across buckets (the same composition argument that admitted
    // equality deletes in r11 and rename epochs in r12); each
    // single-file partition carries its path so the reader resolves
    // its skip list in place
    for (t <- Seq("psl", "psr")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT, seq BIGINT)
             |TBLPROPERTIES (uniqueKeys 'id', numBuckets '4', orderCol 'seq')""".stripMargin)
      sql(s"""INSERT INTO gspj.web.$t
             |SELECT concat('k', id), id * ${if (t == "psl") 1 else 10}, 1
             |FROM range(200)""".stripMargin)
    }
    // predicate deletes through the POSITIONAL path via direct handles
    // on the catalog's layout (unpartitioned = gpart/void)
    val tl = graft.weblog.IcebergLikeTable(spark, s"$warehouse/web/psl",
      "gpart", uniqueKeys = Seq("id"), numBuckets = 4,
      partitionTransform = Some("void(id)"))
    val tr = graft.weblog.IcebergLikeTable(spark, s"$warehouse/web/psr",
      "gpart", uniqueKeys = Seq("id"), numBuckets = 4,
      partitionTransform = Some("void(id)"))
    assert(tl.deletePositional(col("v") >= 150) == 50L)
    assert(tr.deletePositional(col("v") < 1000) == 100L) // ids 0..99
    assert(tl.files.filter(col("is_delete")).count() > 0 &&
      tr.files.filter(col("is_delete")).count() > 0,
      "the fixture must actually carry live positional tombstones")
    val old = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.v + r.v) AS s
                    |FROM gspj.web.psl l JOIN gspj.web.psr r
                    |ON l.id = r.id""".stripMargin)
      val row = q.head
      // survivors: left keeps ids 0..149, right keeps ids 100..199 —
      // the join sees 100..149, row-identical to the V1 masked read
      assert(row.getLong(0) == 50L)
      assert(row.getLong(1) == 11L * (100L to 149L).sum)
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"SPJ under positional deletes must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
      // the native key-grouped read matches the V1 MOR path row set
      assert(sql("SELECT count(*) FROM gspj.web.psl").head.getLong(0) ==
        tl.read.count())
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("hidden bucket(n, col) transform tables join shuffle-free (r14)") {
    // the HIDDEN-partition counterpart of the keyed layout: Iceberg's
    // everyday `PARTITIONED BY (bucket(8, id))` DDL — no uniqueKeys
    // TBLPROPERTIES, the layout itself declares the key grouping; the
    // transform derives with the same xxhash64 the FunctionCatalog's
    // bucket() evaluates, so the two surfaces co-locate identically
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    for (t <- Seq("hbl", "hbr")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT)
             |PARTITIONED BY (bucket(8, id))""".stripMargin)
      sql(s"""INSERT INTO gspj.web.$t
             |SELECT concat('k', id), id * ${if (t == "hbl") 1 else 100}
             |FROM range(400)""".stripMargin)
    }
    val old = (
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.v + r.v) AS s
                    |FROM gspj.web.hbl l JOIN gspj.web.hbr r
                    |ON l.id = r.id""".stripMargin)
      val row = q.head
      assert(row.getLong(0) == 400L)
      assert(row.getLong(1) == 101L * (399L * 400L / 2))
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"hidden-bucket SPJ must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
      // a point lookup through the SQL surface prunes AND answers
      val r = sql("""SELECT l.v, r.v FROM gspj.web.hbl l
                    |JOIN gspj.web.hbr r ON l.id = r.id
                    |WHERE l.id = 'k7'""".stripMargin).head
      assert((r.getLong(0), r.getLong(1)) == ((7L, 700L)))
      // a keyed-layout table and a hidden-bucket table co-locate too:
      // both hash pmod(xxhash64(key), n) — same function, same space
      sql("""CREATE TABLE gspj.web.hbk (id STRING, v BIGINT, seq BIGINT)
            |TBLPROPERTIES (uniqueKeys 'id', numBuckets '8', orderCol 'seq')""".stripMargin)
      sql("INSERT INTO gspj.web.hbk SELECT concat('k', id), id, 1 FROM range(400)")
      val q2 = sql("""SELECT count(*) AS n
                     |FROM gspj.web.hbl l JOIN gspj.web.hbk k
                     |ON l.id = k.id""".stripMargin)
      assert(q2.head.getLong(0) == 400L)
      val shuffles2 = allNodes(q2.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles2.forall(_.outputPartitioning.numPartitions == 1),
        s"hidden-bucket × keyed-layout SPJ must not exchange join inputs:\n" +
          s"${q2.queryExecution.executedPlan}")
    } finally {
      old._1.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      old._2.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  test("the canonical (days, bucket) fact layout joins shuffle-free AND keeps time pruning (r14)") {
    import java.sql.Timestamp
    def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    sql("CREATE NAMESPACE IF NOT EXISTS gspj.web")
    // two facts on Iceberg's everyday layout: time leg for pruning,
    // bucket leg for the join
    for (t <- Seq("fdl", "fdr")) {
      sql(s"""CREATE TABLE gspj.web.$t (id STRING, v BIGINT, ts TIMESTAMP)
             |PARTITIONED BY (days(ts), bucket(4, id))""".stripMargin)
      spark.range(200).selectExpr("concat('k', id) AS id",
          s"id * ${if (t == "fdl") 1 else 100} AS v",
          "timestamp'2024-03-01 10:00:00' + make_interval(0,0,0, CAST(id % 3 AS INT)) AS ts")
        .coalesce(1).createOrReplaceTempView(s"gspj_src_$t")
      sql(s"INSERT INTO gspj.web.$t SELECT * FROM gspj_src_$t")
    }
    val old = (
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = sql("""SELECT count(*) AS n, sum(l.v + r.v) AS s
                    |FROM gspj.web.fdl l JOIN gspj.web.fdr r ON l.id = r.id""".stripMargin)
      val row = q.head
      assert(row.getLong(0) == 200L)
      assert(row.getLong(1) == 101L * (199L * 200L / 2))
      val shuffles = allNodes(q.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.forall(_.outputPartitioning.numPartitions == 1),
        s"(days, bucket) SPJ must not exchange join inputs:\n" +
          s"${q.queryExecution.executedPlan}")
      // the time leg still prunes through the engine handle: one day's
      // slice keeps only that day's bucket leaves
      val wh = warehouse
      val t = graft.weblog.IcebergLikeTable(spark, s"$wh/web/fdl",
        partitionCol = "ts_day_id_bucket",
        partitionTransform = Some("multi(days(ts), bucket(4, id))"))
      import org.apache.spark.sql.functions._
      val day1 = col("ts") >= lit(ts(1)) &&
        col("ts") < lit(Timestamp.valueOf("2024-03-02 00:00:00"))
      val all = t.filesFor(lit(true)).size
      val d1 = t.filesFor(day1)
      assert(d1.nonEmpty && d1.size < all,
        s"the days leg must prune inside the bucketed layout: $d1 of $all")
      // and a point predicate prunes to one bucket per day
      val pf = t.filesFor(col("id") === "k7")
      assert(pf.map(_.split('/').head).distinct.size == 3,
        s"k7 lives in one bucket leaf per of the 3 days: $pf")
      // cross-shape co-location: a (days, bucket) fact joins a PLAIN
      // bucket(4, id) dim shuffle-free — same hash, same count
      sql("""CREATE TABLE gspj.web.fdd (id STRING, seg STRING)
            |PARTITIONED BY (bucket(4, id))""".stripMargin)
      sql("INSERT INTO gspj.web.fdd SELECT concat('k', id), concat('s', id % 3) FROM range(200)")
      val q2 = sql("""SELECT count(*) AS n FROM gspj.web.fdl l
                     |JOIN gspj.web.fdd d ON l.id = d.id""".stripMargin)
      assert(q2.head.getLong(0) == 200L)
      val shuffles2 = allNodes(q2.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles2.forall(_.outputPartitioning.numPartitions == 1),
        s"(days, bucket) × plain-bucket SPJ must not exchange join inputs:\n" +
          s"${q2.queryExecution.executedPlan}")
    } finally {
      old._1.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      old._2.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }
}
