package graft.weblog

import graft.SparkTestBase
import graft.functions.ValidateWebLog

/** T1 validation semantics — the reference's inline cases ported verbatim
  * (dialect A: `schema_validator.py:151-234`; dialect B:
  * `firehose_to_iceberg_transformer.py:147-248`). These are the crispest
  * semantic statement the reference ships (SURVEY.md §5.1).
  */
class ValidatorSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def validateOne(payload: String, dialect: String): (Boolean, String) = {
    import spark.implicits._
    val df = Validator.validate(Seq(payload).toDF("payload"), "payload", dialect)
    val r = df.select("valid", "reason").collect()(0)
    (r.getBoolean(0), r.getString(1))
  }

  // ---- dialect B (iceberg transformer cases, expected labels in-line) ----

  val validB =
    """{"user_id": "897bef5f-294d-4ecc-a3b6-ef2844958720", "session_id": "a5aa20a72c9e37588f9bbeaa",
      | "event": "view", "referrer": "brandon.biz",
      | "user_agent": "Mozilla/4.0 (compatible; MSIE 6.0; Windows NT 5.1; de) Opera 8.52",
      | "ip": "202.165.71.49", "hostname": "toxic.tokyo", "os": "openSUSE",
      | "timestamp": "2022-09-16T07:35:46Z", "uri": "https://phones.madrid/2012/02/12/bed-federal?lane=outcomes&acc=memories"}"""
      .stripMargin.replace("\n", "")

  test("B: fully valid record -> Ok") {
    assert(validateOne(validB, "B") == (true, "ok"))
  }

  test("B: missing optional key (referrer) -> still Ok") {
    val p = validB.replace(""" "referrer": "brandon.biz",""", "")
    assert(validateOne(p, "B") == (true, "ok"))
  }

  test("B: bad datetime format (space, no Z) -> ProcessingFailed") {
    val p = validB.replace("2022-09-16T07:35:46Z", "2022-09-16 07:35:46")
    assert(validateOne(p, "B") == (false, "bad_timestamp"))
  }

  test("B: missing required key (user_id) -> ProcessingFailed") {
    val p = validB.replace(""""user_id": "897bef5f-294d-4ecc-a3b6-ef2844958720", """, "")
    assert(validateOne(p, "B") == (false, "missing_required:user_id"))
  }

  test("B: wrong type (ip as number) -> ProcessingFailed, no coercion") {
    val p = validB.replace(""""ip": "202.165.71.49"""", """"ip": 212234672""")
    assert(validateOne(p, "B") == (false, "wrong_type:ip"))
  }

  test("B: mis-cased column names (userId/sessionId/userAgent) -> ProcessingFailed") {
    val p = validB
      .replace("\"user_id\"", "\"userId\"")
      .replace("\"session_id\"", "\"sessionId\"")
      .replace("\"user_agent\"", "\"userAgent\"")
    val (valid, reason) = validateOne(p, "B")
    assert(!valid && reason == "missing_required:user_id")
  }

  // ---- dialect A (schema_validator cases; camelCase, no event field) ----

  val validA =
    """{"userId": "897bef5f-294d-4ecc-a3b6-ef2844958720", "sessionId": "a5aa20a72c9e37588f9bbeaa",
      | "referrer": "brandon.biz", "userAgent": "Mozilla/4.0 (compatible; MSIE 6.0; Windows NT 5.1; de) Opera 8.52",
      | "ip": "202.165.71.49", "hostname": "toxic.tokyo", "os": "openSUSE",
      | "timestamp": "2022-09-16T07:35:46Z", "uri": "https://phones.madrid/2012/02/12/bed-federal?lane=outcomes&acc=memories"}"""
      .stripMargin.replace("\n", "")

  test("A: valid / missing-optional / bad-ts / missing-required / wrong-type") {
    assert(validateOne(validA, "A") == (true, "ok"))
    assert(validateOne(validA.replace(""" "referrer": "brandon.biz",""", ""), "A") == (true, "ok"))
    assert(validateOne(validA.replace("2022-09-16T07:35:46Z", "2022-09-16 07:35:46"), "A")
      == (false, "bad_timestamp"))
    assert(validateOne(validA.replace(""""userId": "897bef5f-294d-4ecc-a3b6-ef2844958720", """, ""), "A")
      == (false, "missing_required:userId"))
    assert(validateOne(validA.replace(""""ip": "202.165.71.49"""", """"ip": 212234672"""), "A")
      == (false, "wrong_type:ip"))
  }

  // ---- semantics beyond the shipped cases ----

  test("explicit null on nullable field is valid; on required field is not") {
    val nullOs = validB.replace(""""os": "openSUSE"""", """"os": null""")
    assert(validateOne(nullOs, "B") == (true, "ok"))
    val nullUid = validB.replace(""""user_id": "897bef5f-294d-4ecc-a3b6-ef2844958720"""",
      """"user_id": null""")
    assert(validateOne(nullUid, "B") == (false, "missing_required:user_id"))
  }

  test("extra keys are ignored (fastavro semantics)") {
    val p = validB.dropRight(1) + """, "extra_key": "whatever"}"""
    assert(validateOne(p, "B") == (true, "ok"))
  }

  test("garbage payloads") {
    assert(validateOne("""not json at all""", "B")._1 == false)
    assert(validateOne("""[1,2,3]""", "B") == (false, "not_an_object"))
    assert(validateOne("""42""", "B") == (false, "not_an_object"))
  }

  test("strict timestamp: strptime-equivalent leniency and calendar validity") {
    import ValidateWebLog.strictTimestampOk
    assert(strictTimestampOk("2022-09-16T07:35:46Z"))
    assert(strictTimestampOk("2022-9-6T7:5:6Z"), "python strptime accepts 1-digit fields")
    assert(!strictTimestampOk("2022-09-16 07:35:46"))
    assert(!strictTimestampOk("2022-09-16T07:35:46"))
    assert(!strictTimestampOk("2022-02-30T00:00:00Z"), "impossible date")
    assert(!strictTimestampOk("2022-09-16T24:00:00Z"), "hour out of range")
    assert(!strictTimestampOk(""))
  }

  test("validation routes and counts (T4 observe contract)") {
    import spark.implicits._
    val hour = java.time.LocalDateTime.of(2024, 3, 1, 10, 0)
    val df = Generator.frame(spark, 100, seed = 7, hour, invalidEvery = 10)
    val validated = Validator.validate(df, "payload", "B")
    val (ok, bad) = Validator.route(validated)
    assert(ok.count() == 90 && bad.count() == 10)
    // parsed valid records round-trip unmodified with a real event_ts
    val parsed = Validator.parsed(ok, "payload", "B")
    assert(parsed.filter($"event_ts".isNull).count() == 0)
    assert(parsed.filter(!$"event".isin(WebLogSchema.EventTypes: _*)).count() == 0)
  }
}
