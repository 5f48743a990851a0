package graft.weblog

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Skew

/** Dialect A (parquet variant, camelCase) end-to-end + skew utilities. */
class DialectASpec extends SparkTestBase {

  test("dialect A: generate -> validate -> raw -> compact -> query") {
    val hour = LocalDateTime.of(2024, 4, 1, 9, 0)
    val raw = Files.createTempDirectory("a-raw").toString
    val pq = Files.createTempDirectory("a-pq").toString
    val df = Generator.frame(spark, 300, seed = 9, hour, dialect = "A", invalidEvery = 30)
    val (ok, bad) = Validator.route(Validator.validate(df, "payload", "A"))
    assert(ok.count() == 290 && bad.count() == 10)
    Zones.writeRawJson(ok, raw)
    val hp = Compaction.HourPartition.of(hour)
    val n = Compaction.compactHour(spark, raw, pq, hp, dialect = "A")
    assert(n == 290)
    val out = spark.read.parquet(s"$pq/${hp.relPath}")
    assert(out.columns.contains("userId") && out.columns.contains("sessionId"))
    assert(out.filter(col("event_ts").isNull).count() == 0)
  }

  test("salted aggregation equals plain aggregation on skewed keys") {
    import spark.implicits._
    // 90% of rows share one key — the hot-key shape
    val df = (1 to 10000).map(i => (if (i % 10 == 0) s"u${i % 50}" else "hot", 1.0))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    val salted = Skew.saltedAgg(df, Seq("k"), 16,
      partial = Seq(count(lit(1)).as("c"), sum("v").as("ps")),
      merge = Seq(sum("c").as("cnt"), sum("ps").as("s")))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val left = (1 to 5000).map(i => (if (i % 5 == 0) i % 100 else 7, i)).toDF("k", "lv")
    val right = (0 to 100).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
    val salted = Skew.saltedJoin(left, right, "k", 8).select("k", "lv", "rv")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }
}
