package graft.weblog

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** COMPOSITE (multi-column) partition specs —
  * `PARTITIONED BY (days(ts), event)` and the reference's 4-level
  * year/month/day/hour raw-zone layout (`athena_named_query.py:33-37`)
  * — carried by the format's single partition dimension as a
  * [[PartitionTransforms.Multi]] value. The properties that matter:
  * per-LEG pruning (a predicate on any one source column skips files),
  * leg composition (both predicates intersect), injective value
  * encoding (separator/percent escaping, NULL token), and full
  * round-trip through the SQL catalog.
  */
class MultiPartitionSpec extends SparkTestBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:15:00")

  private def events(days: Range, evs: Seq[String]): DataFrame = {
    import spark.implicits._
    days.flatMap(d => evs.map(e => (s"u$d-$e", e, ts(d, 6))))
      .toDF("user_id", "event", "ts")
  }

  private def multiTable(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      partitionCol = "pmulti",
      partitionTransform = Some("multi(days(ts), identity(event))"))

  test("multi spec parses, derives, and round-trips its spec string") {
    val m = PartitionTransforms.parse("multi(days(ts), identity(event))")
      .asInstanceOf[PartitionTransforms.Multi]
    assert(m.sources == Seq("ts", "event"))
    assert(m.spec == "multi(days(ts), identity(event))")
    assert(PartitionTransforms.parse(m.spec) == m)
    // truncate legs keep their interior comma through the parser
    val m2 = PartitionTransforms.parse(
      "multi(truncate(100, n), identity(region))")
    assert(m2.asInstanceOf[PartitionTransforms.Multi].legs.head ==
      PartitionTransforms.Truncate("n", 100L))
    // invalid shapes refuse
    intercept[IllegalArgumentException](
      PartitionTransforms.parse("multi(days(ts))"))
    intercept[IllegalArgumentException](
      PartitionTransforms.parse("multi(days(ts), void(x))"))
    intercept[IllegalArgumentException](
      PartitionTransforms.parse("multi(days(ts), hours(ts))"))
  }

  test("property: composite-value encoding is injective and round-trips arbitrary identity values") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val weird = Gen.listOfN(8,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('|', '%', '7', 'C', 'N', '=', '/')))
      .map(_.mkString)
    val pairs = Gen.zip(weird, weird)
    val m = PartitionTransforms.parse("multi(identity(a), identity(b))")
      .asInstanceOf[PartitionTransforms.Multi]
    import spark.implicits._
    (0 until 200).foreach { i =>
      pairs.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (a, b) =>
        // derive through the real Column expression, invert through
        // allBounds: both legs must round-trip exactly
        val derived = Seq((a, b)).toDF("a", "b").select(m.derive).head.getString(0)
        val bounds = m.allBounds(derived)
        assert(bounds.get("a").contains((a, a)),
          s"leg a must round-trip: ($a, $b) -> '$derived' -> $bounds")
        assert(bounds.get("b").contains((b, b)),
          s"leg b must round-trip: ($a, $b) -> '$derived' -> $bounds")
      }
    }
  }

  test("per-leg pruning: time-only prunes, event-only prunes, both compose") {
    val t = multiTable("mp_prune")
    // one file per (day, event): 3 days x 3 events = 9 files
    for (d <- 1 to 3; e <- Seq("click", "view", "purchase"))
      t.append(events(d to d, Seq(e)).coalesce(1))
    assert(t.filesFor(lit(true)).size == 9)
    assert(t.read.columns.toSet == Set("user_id", "event", "ts"),
      "the composite partition column must stay hidden")
    // time-only predicate: day 2 -> 3 of 9 files
    val day2 = col("ts") >= lit(ts(2, 0)) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-03 00:00:00"))
    assert(t.filesFor(day2).size == 3, "days leg must prune alone")
    // event-only predicate: 3 of 9 files
    assert(t.filesFor(col("event") === "view").size == 3,
      "identity leg must prune alone")
    // both: exactly the 1 covering file
    assert(t.filesFor(day2 && col("event") === "view").size == 1,
      "legs must compose by intersection")
    // census through the pruned read
    assert(t.readWhere(day2 && col("event") === "view").count() == 1)
    assert(t.readWhere(day2).count() == 3)
    assert(t.read.count() == 9)
  }

  test("separator/percent escaping and NULL legs stay injective and sound") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mp_esc").toString + "/t",
      partitionCol = "pmulti",
      partitionTransform = Some("multi(truncate(10, n), identity(tag))"))
    val rows = Seq(
      (1L, "a|b", "pipe"),      // separator inside an identity value
      (12L, "a%7Cb", "litpct"), // literal %7C must NOT collide with escaped |
      (23L, null: String, "nullv"),
      (34L, "plain", "plain"))
      .toDF("n", "tag", "name")
    for (r <- Seq("pipe", "litpct", "nullv", "plain"))
      t.append(rows.filter(col("name") === r).coalesce(1))
    assert(t.read.count() == 4)
    // injective: the two visually-colliding tags land in DIFFERENT leaves
    val leaves = t.files.select("leaf").collect().map(_.getString(0)).distinct
    assert(leaves.length == 4, s"expected 4 distinct leaves, got ${leaves.toSeq}")
    // identity-leg pruning on escaped values: trunc-leg prefixes name
    // the four leaves — 0|=pipe, 10|=litpct, 20|=null, 30|=plain. The
    // "a|b" lookup must keep the pipe file and SKIP the literal-"a%7Cb"
    // file (injective encoding, no collision); the all-NULL-tag file
    // stays unprunable (absence never prunes — the same posture as an
    // all-null stats column).
    val pipeHits = t.filesFor(col("tag") === "a|b")
    assert(pipeHits.exists(_.startsWith("pmulti=0|")), "must keep the a|b file")
    assert(!pipeHits.exists(_.startsWith("pmulti=10|")),
      "escaped 'a|b' must not collide with literal 'a%7Cb'")
    assert(!pipeHits.exists(_.startsWith("pmulti=30|")))
    val litHits = t.filesFor(col("tag") === "a%7Cb")
    assert(litHits.exists(_.startsWith("pmulti=10|")), "must keep the literal file")
    assert(!litHits.exists(_.startsWith("pmulti=0|")),
      "literal 'a%7Cb' must not collide with escaped 'a|b'")
    assert(t.readWhere(col("tag") === "a|b").count() == 1)
    assert(t.readWhere(col("tag") === "a%7Cb").count() == 1)
    // the NULL-tag row is readable and a tag predicate skips its file
    assert(t.readWhere(col("tag").isNull).count() == 1)
    // truncate leg prunes across all four files
    assert(t.filesFor(col("n") >= 30).size == 1)
  }

  test("SQL catalog: PARTITIONED BY (days(ts), event) prunes per leg, census matches") {
    val wh = Files.createTempDirectory("mp_sql").toString
    spark.conf.set("spark.sql.catalog.gmps", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmps.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmps.web")
    spark.sql("""CREATE TABLE gmps.web.ev
                |(user_id STRING, event STRING, ts TIMESTAMP)
                |PARTITIONED BY (days(ts), event)""".stripMargin)
    events(1 to 3, Seq("click", "view")).createOrReplaceTempView("mp_src")
    spark.sql("INSERT INTO gmps.web.ev SELECT * FROM mp_src")
    // user-facing schema hides the composite column
    assert(spark.table("gmps.web.ev").columns.toSet ==
      Set("user_id", "event", "ts"))
    // partitioning() reports BOTH transforms (SHOW CREATE-style surface)
    val t = spark.sessionState.catalogManager.catalog("gmps")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("web"), "ev"))
    assert(t.partitioning().map(_.describe).toSeq ==
      Seq("days(ts)", "event")) // V2 identity describes as the bare column
    // per-leg pruning through the engine handle the descriptor rebuilds
    val eng = IcebergLikeTable(spark, s"$wh/web/ev",
      partitionCol = "ts_day_event",
      partitionTransform = Some("multi(days(ts), identity(event))"))
    val total = eng.filesFor(lit(true)).size
    val timeHit = eng.filesFor(col("ts") >= lit(ts(2, 0)) &&
      col("ts") < lit(Timestamp.valueOf("2024-03-03 00:00:00"))).size
    val evHit = eng.filesFor(col("event") === "view").size
    assert(timeHit < total && timeHit > 0, s"time leg: $timeHit of $total")
    assert(evHit < total && evHit > 0, s"event leg: $evHit of $total")
    val cnt = spark.sql(
      """SELECT count(*) FROM gmps.web.ev
        |WHERE event = 'view' AND ts >= TIMESTAMP '2024-03-02 00:00:00'
        |  AND ts < TIMESTAMP '2024-03-03 00:00:00'""".stripMargin)
      .head.getLong(0)
    assert(cnt == 1L)
    // the reference's 4-level identity layout: year/month/day/hour
    spark.sql("""CREATE TABLE gmps.web.raw
                |(payload STRING, year STRING, month STRING, day STRING, hour STRING)
                |PARTITIONED BY (year, month, day, hour)""".stripMargin)
    spark.sql("""INSERT INTO gmps.web.raw VALUES
                |('a','2024','03','01','00'), ('b','2024','03','01','01'),
                |('c','2024','03','02','00')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gmps.web.raw WHERE day = '01'")
      .head.getLong(0) == 2L)
    val raw = IcebergLikeTable(spark, s"$wh/web/raw",
      partitionCol = "year_month_day_hour",
      partitionTransform = Some(
        "multi(identity(year), identity(month), identity(day), identity(hour))"))
    assert(raw.filesFor(col("hour") === "00").size == 2)
    assert(raw.filesFor(col("day") === "02").size == 1)
  }

  test("keyed multi-partitioned table: upsert routes by the composite leaf") {
    import spark.implicits._
    val t = IcebergLikeTable(spark,
      Files.createTempDirectory("mp_keyed").toString + "/t",
      partitionCol = "pmulti", uniqueKeys = Seq("id"), numBuckets = 4,
      partitionTransform = Some("multi(days(ts), identity(event))"))
    def batch(rows: Seq[(String, String, Timestamp, Long)]) =
      rows.toDF("id", "event", "ts", "seq")
    t.upsert(batch(Seq(("k1", "click", ts(1, 6), 1L),
      ("k2", "view", ts(2, 6), 1L))), "seq")
    t.upsert(batch(Seq(("k1", "click", ts(1, 6), 2L))), "seq")
    val rows = t.read.orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Long]("seq"))).toSeq
    assert(rows == Seq(("k1", 2L), ("k2", 1L)))
  }
}
