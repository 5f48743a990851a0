package graft.functions

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.weblog.WebLogSchema

/** Strict Avro-style record validation (reference operator T1,
  * SURVEY.md §2.2): one pass over the raw JSON payload, replicating
  * `fastavro.validation.validate` semantics exactly as pinned by the
  * reference's inline cases
  * (`schema_validator.py:151-234`, `firehose_to_iceberg_transformer.py:147-248`):
  *
  *  - payload must be a JSON object;
  *  - required fields must be present, non-null, and JSON strings
  *    (no coercion — `"ip": 212234672` is invalid);
  *  - nullable fields (`referrer`/`userAgent`/`os`) may be absent or null,
  *    but if present must be strings;
  *  - extra keys are ignored (fastavro semantics) — a mis-cased key fails
  *    only because the snake_case required field is then missing
  *    (`firehose_to_iceberg_transformer.py:215-229`);
  *  - `timestamp` must parse with strptime('%Y-%m-%dT%H:%M:%SZ')
  *    (`schema_validator.py:70-85`): 'T'/'Z' literal, 1-2 digit
  *    month/day/hour/minute/second accepted (python strptime is lenient
  *    there), semantic date validity enforced.
  *
  * Implemented as a Catalyst `Expression` (not a Scala UDF) so the
  * validation runs on the raw `UTF8String` inside the task with no
  * encoder SerDe round-trip, and with real `doGenCode`: the generated
  * code calls this instance's `validate` directly, keeping the
  * surrounding projection inside whole-stage codegen (a
  * `CodegenFallback` here would force an interpreted island on the
  * ingest hot path).
  *
  * Returns `struct<valid: boolean, reason: string>`; reason is "ok" for
  * valid records (result-code mapping: Ok/ProcessingFailed,
  * `schema_validator.py:124-138`).
  */
case class ValidateWebLog(child: Expression, dialect: String)
    extends UnaryExpression {

  override def dataType: DataType = ValidateWebLog.resultType
  override def nullable: Boolean = false

  @transient private lazy val fields = WebLogSchema.fields(dialect)
  @transient private lazy val mapper = new ObjectMapper()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ValidateWebLog.result(valid = false, "null_payload")
    else validate(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("validator", this, classOf[ValidateWebLog].getName)
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    val code =
      code"""
        ${childGen.code}
        $rowCls ${ev.value} = ${childGen.isNull}
          ? $ref.nullPayloadResult()
          : $ref.validate(${childGen.value}.toString());
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  def nullPayloadResult(): InternalRow = ValidateWebLog.result(valid = false, "null_payload")

  def validate(payload: String): InternalRow = {
    val node: JsonNode =
      try mapper.readTree(payload)
      catch { case NonFatal(_) => return ValidateWebLog.result(valid = false, "invalid_json") }
    if (node == null || !node.isObject)
      return ValidateWebLog.result(valid = false, "not_an_object")
    var i = 0
    while (i < fields.length) {
      val (name, required) = fields(i)
      val f = node.get(name)
      if (f == null || f.isNull) {
        if (required) return ValidateWebLog.result(valid = false, s"missing_required:$name")
      } else if (!f.isTextual) {
        return ValidateWebLog.result(valid = false, s"wrong_type:$name")
      }
      i += 1
    }
    val ts = node.get("timestamp")
    if (!ValidateWebLog.strictTimestampOk(ts.asText()))
      return ValidateWebLog.result(valid = false, "bad_timestamp")
    ValidateWebLog.result(valid = true, "ok")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "validate_weblog"
}

object ValidateWebLog {
  val resultType: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = false)))

  private[functions] def result(valid: Boolean, reason: String): InternalRow =
    InternalRow(valid, UTF8String.fromString(reason))

  private val TsRe =
    "^(\\d{4})-(\\d{1,2})-(\\d{1,2})T(\\d{1,2}):(\\d{1,2}):(\\d{1,2})Z$".r

  /** strptime('%Y-%m-%dT%H:%M:%SZ') equivalent: shape plus calendar
    * validity (2022-02-30 is invalid even though it matches the regex).
    */
  def strictTimestampOk(s: String): Boolean = s match {
    case TsRe(y, mo, d, h, mi, se) =>
      try {
        java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, se.toInt)
        true
      } catch { case _: java.time.DateTimeException => false }
    case _ => false
  }
}
