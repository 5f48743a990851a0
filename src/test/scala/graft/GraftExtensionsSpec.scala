package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions install path: a fresh session built with
  * GraftExtensions must expose every native expression as a SQL
  * function with no imperative registration.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // another suite's session may be active; clear so getOrCreate builds
    // a NEW SparkSession (sharing the context) that applies extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("sorted_intersect_count works through SQL") {
    val r = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 7L, 9L), array(3L, 4L, 9L, 11L)) AS c")
      .collect().head.getInt(0)
    assert(r === 2)
  }

  test("minhash_sigs returns k minima") {
    val row = spark.sql("SELECT minhash_sigs(array(42L, 7L, 99L), 16) AS s")
      .collect().head.getSeq[Long](0)
    assert(row.length === 16)
    // deterministic: same input -> same signature
    val row2 = spark.sql("SELECT minhash_sigs(array(42L, 7L, 99L), 16) AS s")
      .collect().head.getSeq[Long](0)
    assert(row === row2)
  }

  test("validate_weblog_b accepts valid and rejects bad timestamp") {
    val ok = spark.sql(
      """SELECT validate_weblog_b('{"user_id":"u1","session_id":"s1","event":"view",
        |"ip":"1.2.3.4","hostname":"h","timestamp":"2024-01-01T00:00:00Z","uri":"/"}').valid AS v"""
        .stripMargin.replace("\n", "")).collect().head.getBoolean(0)
    assert(ok)
    val bad = spark.sql(
      """SELECT validate_weblog_b('{"user_id":"u1","session_id":"s1","event":"view",
        |"ip":"1.2.3.4","hostname":"h","timestamp":"2024-01-01 00:00:00","uri":"/"}').reason AS r"""
        .stripMargin.replace("\n", "")).collect().head.getString(0)
    assert(bad === "bad_timestamp")
  }
}
