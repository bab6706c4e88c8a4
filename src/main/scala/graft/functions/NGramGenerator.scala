package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** §2.J `udtf_generator` stretch path (SURVEY.md): a native Catalyst
  * `Generator` — the row-expander primitive behind explode/inline — that
  * emits one row per n-gram of a token array. Planned through Spark's
  * `GenerateExec`, so the expansion streams per input row with no
  * intermediate array allocation per document (the HOF formulation
  * `explode(transform(sequence(...), ...))` materializes the full n-gram
  * array per row first).
  *
  * Generators evaluate row-at-a-time inside GenerateExec (CodegenFallback
  * is the standard posture for custom generators; the surrounding
  * projection/aggregation still codegens).
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"ngrams expects array<string>, got ${other.sql}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val m = arr.numElements()
      if (m < n) Iterator.empty
      else {
        val toks = new Array[UTF8String](m)
        var i = 0
        while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
        val sep = UTF8String.fromString(" ")
        (0 to m - n).iterator.map { j =>
          InternalRow(UTF8String.concatWs(sep, toks.slice(j, j + n).toSeq: _*))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}

object NGramGenerator {
  /** DataFrame entry point: `df.select(ngrams(col("toks"), 2))` expands to
    * one row per n-gram, column name `gram` (the analyzer's
    * ExtractGenerator lowers it into a Generate node). */
  def ngrams(tokens: Column, n: Int): Column =
    Bridge.column(NGramGenerator(Bridge.expression(tokens), n))
}
