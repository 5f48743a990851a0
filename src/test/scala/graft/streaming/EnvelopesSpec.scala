package graft.streaming

import java.util.Base64

import graft.SparkTestBase

class EnvelopesSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("batch envelope unwraps records with partition keys (S2 shape)") {
    import spark.implicits._
    val body =
      """{"records": [
        |  {"data": "{\"user_id\": \"u1\"}\n", "partition-key": "u1"},
        |  {"data": "{\"user_id\": \"u2\"}", "partition-key": "u2"}]}""".stripMargin
    val out = Envelopes.fromBatchEnvelope(Seq(body).toDF("body")).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == """{"user_id": "u1"}""") // newline trimmed (T2)
    assert(out(1).getString(1) == "u2")
  }

  test("single envelope unwraps Data/PartitionKey, base64 optional (S1 shape)") {
    import spark.implicits._
    val payload = """{"user_id": "u9"}"""
    val b64 = Base64.getEncoder.encodeToString(payload.getBytes("UTF-8"))
    val plain = s"""{"Data": ${ujsonQuote(payload)}, "PartitionKey": "u9"}"""
    val encoded = s"""{"Data": "$b64", "PartitionKey": "u9"}"""
    val o1 = Envelopes.fromSingleEnvelope(Seq(plain).toDF("body")).collect()(0)
    val o2 = Envelopes.fromSingleEnvelope(Seq(encoded).toDF("body"), base64Encoded = true)
      .collect()(0)
    assert(o1.getString(0) == payload && o2.getString(0) == payload)
    assert(o1.getString(1) == "u9")
  }

  private def ujsonQuote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("shardBy co-locates a key in one partition") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"payload$i", s"user${i % 7}"))
      .toDF("payload", "partition_key")
    val sharded = Envelopes.shardBy(df, 4)
    val perKeyPartitions = sharded
      .withColumn("pid", spark_partition_id())
      .groupBy("partition_key").agg(countDistinct("pid").as("n"))
      .filter(col("n") > 1).count()
    assert(perKeyPartitions == 0)
  }

  test("Engine result location: execute lands CSV results like the Athena workgroup") {
    val loc = java.nio.file.Files.createTempDirectory("results").toString
    val e = graft.Engine(spark, loc)
    val (id, df) = e.execute("SELECT 1 AS a, 'x' AS b")
    assert(df.count() == 1)
    val csv = spark.read.option("header", "true").csv(s"$loc/$id")
    assert(csv.columns.toSeq == Seq("a", "b"))
    assert(csv.collect()(0).getString(0) == "1")
    // no result location configured -> workgroup refuses
    intercept[IllegalStateException](graft.Engine(spark).execute("SELECT 1"))
    // oversized result set -> fails loudly before the one-task CSV copy,
    // and leaves no staging behind
    val ex = intercept[IllegalStateException](
      e.execute("SELECT explode(sequence(1, 10)) AS n", maxResultRows = 3))
    assert(ex.getMessage.contains("rows"))
    assert(!new java.io.File(loc).listFiles().exists(_.getName.startsWith(".staging")))
  }

  test("Engine facade: sql + named queries + weblog SQL functions") {
    val e = graft.Engine(spark)
    assert(e.sql("SELECT 1 AS one").collect()(0).getInt(0) == 1)
    e.registerNamedQuery("probe", "SELECT 41 + 1 AS v")
    assert(e.runNamed("probe").collect()(0).getInt(0) == 42)
    assert(e.namedQueries.contains("count_raw"))
    // the validator is registered as a SQL function
    val r = e.sql(
      """SELECT validate_weblog_B('{"user_id":"u","session_id":"s","event":"view",
        |"ip":"1.2.3.4","hostname":"h","os":"l","timestamp":"2024-01-01T00:00:00Z",
        |"uri":"https://x"}') AS v""".stripMargin.replace("\n", ""))
      .selectExpr("v.valid").collect()(0).getBoolean(0)
    assert(r)
  }
}
