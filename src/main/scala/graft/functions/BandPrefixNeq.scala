package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** `band_prefix_neq(a, b, k)` — true iff the first `k` positions of the
  * two long arrays are pairwise DISTINCT (`a[i] != b[i]` for all
  * `i < k`). The first-colliding-band filter of the exploded LSH
  * candidate enumeration (r16): a pair that collides in several bands
  * is emitted by the (band, bucket) self-join once per colliding band,
  * and this predicate keeps exactly the row whose band is the FIRST
  * collision — so the join needs no `distinct` (the r15 exploded
  * experiment's killer: the distinct materialized and shuffled the
  * full collision multiplicity). One tight loop per matched row, same
  * per-row cost as the per-band join form's conjunction chain.
  *
  * Inputs are the enumeration's own band-hash arrays: non-null
  * elements by construction, `k ≤ |a| = |b|` (bands). Nulls guard to
  * false via the TernaryExpression null contract.
  */
case class BandPrefixNeq(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_prefix_neq needs (array<bigint>, array<bigint>, int), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      k.asInstanceOf[Int])

  def compute(a: ArrayData, b: ArrayData, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      if (a.getLong(i) == b.getLong(i)) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandPrefixNeq", this, classOf[BandPrefixNeq].getName)
    nullSafeCodeGen(ctx, ev, (a, b, k) => s"${ev.value} = $ref.compute($a, $b, $k);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BandPrefixNeq =
    copy(first = newFirst, second = newSecond, third = newThird)
}
