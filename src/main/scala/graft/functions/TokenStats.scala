package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document token statistics — t5's hot path as ONE pass over
  * the text instead of an explode + two hash aggregates.
  *
  * The declarative formulation (explode(split) → groupBy(doc_id, tok) →
  * groupBy(doc_id)) is value-correct but shuffles the corpus's distinct
  * (doc, token) pairs — at 100 TB that shuffle IS the operator's cost,
  * and it buys nothing a per-row frequency map doesn't: the statistics
  * are strictly within-document. This expression computes them in one
  * tight JVM loop per row — ZERO shuffles for the whole operator (the
  * remaining Exchange is the presentation ORDER BY).
  *
  * Value parity is EXACT, pinned by HygieneSpec's JVM re-derivation and
  * the unchanged DuckDB oracle:
  *  - tokens = `split(text, " ", -1)` semantics (empties kept, incl.
  *    consecutive/trailing separators — DuckDB `string_split` matches);
  *  - counts are by exact token string;
  *  - output = [n_tokens, n_distinct, max_frequency] as array<long>.
  *
  * CodegenFallback is deliberate (same rationale as [[TextShingles]]):
  * the per-row call is one virtual dispatch; a custom doGenCode would
  * just duplicate the loop as a string.
  */
object TokenStats {

  /** [n_tokens, n_distinct, top_count] for the split-on-single-space
    * token stream.
    */
  def stats(text: UTF8String): Array[Long] = {
    val toks = text.toString.split(" ", -1)
    val freq = new java.util.HashMap[String, Int](toks.length * 2)
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = freq.merge(toks(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    Array(toks.length.toLong, freq.size.toLong, top.toLong)
  }

  def statsCol(c: Column): Column =
    GraftColumns.column(TokenStatsExpr(GraftColumns.expression(c)))
}

/** array<long> [n_tokens, n_distinct, top_count] per document (see
  * [[TokenStats]]); NULL on NULL input.
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_stats needs string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenStats.stats(input.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}
