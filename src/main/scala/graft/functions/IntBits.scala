package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Binary digit count of a long — `length(bin(x))` without the string:
  * the built-in form materializes a 1-64 char string per row just to take
  * its length, which in t8 ([[graft.ops.TextOps.rarity]]) means one
  * allocation per distinct (doc, token) pair — pure garbage at corpus
  * scale. This emits a single `Long.numberOfLeadingZeros` intrinsic in
  * whole-stage codegen.
  *
  * Semantics are EXACTLY `length(bin(x))` for every long (unit-pinned
  * against Spark's own `bin` in IntBitsSpec): 1 for 0, floor(log2(x))+1
  * for x > 0, and 64 for negatives (bin's two's-complement string).
  * The DuckDB oracle keeps `length(format('{:b}', x))` — equivalent ONLY
  * for x >= 0: DuckDB formats negatives sign-and-magnitude ('-1' → 2, not
  * 64), so an oracled consumer must guarantee a non-negative input the way
  * t8/s6 do (their arguments are quotients >= 1 by construction). Guard or
  * re-derive the oracle before feeding this a value that can go negative.
  */
case class BitLength64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bitlength64 needs BIGINT, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (x == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"($x == 0L) ? 1 : (64 - java.lang.Long.numberOfLeadingZeros($x))")

  override protected def withNewChildInternal(newChild: Expression): BitLength64 =
    copy(child = newChild)
}

object IntBits {
  /** Column form: binary digit count (see [[BitLength64]]). */
  def bitLength(x: Column): Column =
    GraftColumns.column(BitLength64(GraftColumns.expression(x)))
}
