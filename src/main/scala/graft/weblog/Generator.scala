package graft.weblog

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.UUID

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic web-log producer (reference operator S13,
  * `web-analytics-parquet/src/utils/gen_fake_data.py:52-62,29-34` and the
  * iceberg flavor with `event` at
  * `web-analytics-iceberg/src/utils/gen_fake_data.py:52-63`): uuid userId,
  * 12-byte-hex sessionId, browser UA, dotted-quad ip, hostname, os,
  * strict-format timestamp inside the target hour, uri with two query
  * params. Seeded per record id, so the same (seed, i) always yields the
  * same payload on any executor — generation is distributed via
  * `spark.range`, never a driver loop.
  */
object Generator {

  private val referrers = Seq("brandon.biz", "toe.gq", "transfer.edu",
    "liquid.aquitaine", "search.example", "news.example")
  private val userAgents = Seq(
    "Mozilla/4.0 (compatible; MSIE 6.0; Windows NT 5.1; de) Opera 8.52",
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/119.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/119.0.0.0")
  private val hostnames = Seq("toxic.tokyo", "drivers.glass", "propecia.tc",
    "consequently.com", "shop.example", "blog.example")
  private val oses = Seq("openSUSE", "Windows 8.1", "Lubuntu", "Gentoo",
    "macOS", "Android")
  private val slugs = Seq("bed-federal", "cialis-prayer", "alan-publish",
    "use-phone-task", "spring-sale", "winter-launch")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")

  private def esc(s: String): String = s // generated strings are JSON-safe

  /** One valid payload for record `i` (pure function of (seed, i, hour)). */
  def payload(seed: Long, i: Long, hour: LocalDateTime, dialect: String = "B"): String = {
    val r = new Random(seed * 1000003L + i)
    val userId = new UUID(r.nextLong(), r.nextLong()).toString
    val sessionId = Array.fill(24)("0123456789abcdef" (r.nextInt(16))).mkString
    val referrer = referrers(r.nextInt(referrers.size))
    val ua = userAgents(r.nextInt(userAgents.size))
    val ip = s"${r.nextInt(223) + 1}.${r.nextInt(256)}.${r.nextInt(256)}.${r.nextInt(256)}"
    val host = hostnames(r.nextInt(hostnames.size))
    val os = oses(r.nextInt(oses.size))
    val ts = hour.withMinute(r.nextInt(60)).withSecond(r.nextInt(60)).format(tsFmt)
    val uri = s"https://$host/2024/01/15/${slugs(r.nextInt(slugs.size))}?lane=${r.nextInt(100)}&acc=${r.nextInt(100)}"
    val event = WebLogSchema.EventTypes(r.nextInt(WebLogSchema.EventTypes.size))
    val optionalReferrer = if (r.nextInt(10) == 0) "" else s""""referrer": "${esc(referrer)}", """
    dialect match {
      case "B" | "b" | "snake" =>
        s"""{"user_id": "$userId", "session_id": "$sessionId", "event": "$event", $optionalReferrer"user_agent": "${esc(ua)}", "ip": "$ip", "hostname": "$host", "os": "$os", "timestamp": "$ts", "uri": "${esc(uri)}"}"""
      case _ =>
        s"""{"userId": "$userId", "sessionId": "$sessionId", $optionalReferrer"userAgent": "${esc(ua)}", "ip": "$ip", "hostname": "$host", "os": "$os", "timestamp": "$ts", "uri": "${esc(uri)}"}"""
    }
  }

  /** Deterministically corrupt payload `i` the way the reference's test
    * cases do (`firehose_to_iceberg_transformer.py:176-229`): bad datetime
    * format, missing required key, number where a string is required.
    */
  def corrupt(p: String, mode: Int): String = mode % 3 match {
    case 0 => p.replaceAll("""T(\d{2}:\d{2}:\d{2})Z""", " $1") // space, no Z
    case 1 => p.replaceFirst(""""user_?[Ii]d": "[^"]*", """, "") // drop required (either dialect)
    case _ => p.replaceAll(""""ip": "[^"]*"""", "\"ip\": 212234672")
  }

  /** Distributed frame of `n` payloads for the hour, `1/invalidEvery`
    * corrupted (0 = all valid). Columns: id, payload, ingest_ts.
    */
  def frame(spark: SparkSession, n: Long, seed: Long, hour: LocalDateTime,
      dialect: String = "B", invalidEvery: Int = 0): DataFrame = {
    val hourStr = hour.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:00:00"))
    val gen = udf { (i: Long) =>
      val p = payload(seed, i, hour, dialect)
      if (invalidEvery > 0 && i % invalidEvery == 0) corrupt(p, (i / invalidEvery).toInt) else p
    }
    spark.range(n)
      .withColumn("payload", gen(col("id")))
      .withColumn("ingest_ts", to_timestamp(lit(hourStr)))
  }
}
