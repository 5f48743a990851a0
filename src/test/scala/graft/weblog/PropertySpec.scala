package graft.weblog

import java.time.LocalDateTime

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.functions.ValidateWebLog

/** Property tests (SURVEY.md §5.2): generator payloads always validate;
  * corruption always invalidates; the strict-timestamp check agrees with
  * a reference reimplementation on arbitrary inputs. (ScalaCheck Gens
  * sampled with a fixed seed — no scalatestplus bridge in the offline
  * cache.)
  */
class PropertySpec extends SparkTestBase {

  private def forAll[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  private val hour = LocalDateTime.of(2024, 5, 1, 12, 0)
  private def check(p: String, dialect: String): Boolean = {
    val e = ValidateWebLog(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(p)), dialect)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getBoolean(0)
  }

  test("every generated payload is valid, in both dialects") {
    forAll(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0L, 1000L))) { case (i, seed) =>
      assert(check(Generator.payload(seed, i, hour, "B"), "B"))
      assert(check(Generator.payload(seed, i, hour, "A"), "A"))
    }
  }

  test("every corruption mode invalidates a valid payload") {
    forAll(Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0, 2))) { case (i, mode) =>
      val p = Generator.payload(7, i, hour, "B")
      assert(!check(Generator.corrupt(p, mode), "B"))
    }
  }

  test("strict timestamp check agrees with a strptime reference model") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("u-M-d'T'H:m:s'Z'")
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)
    def reference(s: String): Boolean =
      s.matches("""\d{4}-\d{1,2}-\d{1,2}T\d{1,2}:\d{1,2}:\d{1,2}Z""") &&
        (try { java.time.LocalDateTime.parse(s, fmt); true }
         catch { case _: Exception => false })

    val tsGen = for {
      y <- Gen.chooseNum(1900, 2100); mo <- Gen.chooseNum(0, 13)
      d <- Gen.chooseNum(0, 32); h <- Gen.chooseNum(0, 25)
      mi <- Gen.chooseNum(0, 61); se <- Gen.chooseNum(0, 61)
      sep <- Gen.oneOf("T", " ", "t")
      z <- Gen.oneOf("Z", "", "z")
    } yield s"$y-$mo-${d}$sep$h:$mi:${se}$z"

    forAll(tsGen) { s =>
      assert(ValidateWebLog.strictTimestampOk(s) == reference(s), s"input: $s")
    }
  }

  test("valid records round-trip through parse unchanged (multiset property)") {
    val df = Generator.frame(spark, 400, seed = 13, hour, invalidEvery = 8)
    val (ok, _) = Validator.route(Validator.validate(df, "payload", "B"))
    val parsed = Validator.parsed(ok, "payload", "B")
    // re-serialize the parsed fields; every payload must equal its source
    import org.apache.spark.sql.functions._
    val bad = parsed.filter(
      get_json_object(col("payload"), "$.user_id") =!= col("user_id") ||
        get_json_object(col("payload"), "$.timestamp") =!= col("timestamp") ||
        get_json_object(col("payload"), "$.event") =!= col("event"))
    assert(bad.count() == 0)
  }
}
