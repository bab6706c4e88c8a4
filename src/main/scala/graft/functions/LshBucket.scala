package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Fused random-hyperplane LSH bucket: `lsh_bucket(embedding, planes)` over
  * an ArrayType(FloatType) column → INT whose bit j is the sign of the
  * dot product with plane j.
  *
  * Arithmetic is bit-exact with the HOF formulation it replaces (and the
  * DuckDB oracle): each float widened to double, then a sequential
  * left-to-right fold of x_i·p_i per plane. The planes ride along as a
  * codegen reference object, so all |planes|·dim multiply-adds run in one
  * generated loop per row — the zip_with+aggregate chain evaluated
  * interpreted lambdas and allocated an intermediate array per plane per
  * row (8× for the bucket). Same remedy as CosineSim / MinHashSig /
  * SubspaceL2: similarity-search hot paths stay inside codegen.
  */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 31, "bucket bits must fit an INT")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bucket = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val dim = math.min(n, p.length)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += a.getFloat(i).toDouble * p(i); i += 1 }
      if (dot > 0) bucket |= 1 << j
      j += 1
    }
    Integer.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val dim = ctx.freshName("dim")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < ${planes.length}; $j++) {
         |  double[] $p = $planesRef[$j];
         |  int $dim = $n < $p.length ? $n : $p.length;
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += (double) $a.getFloat($i) * $p[$i];
         |  }
         |  if ($dot > 0) $bucket |= 1 << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def lsh_bucket(embedding: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.column(LshBucket(Bridge.expression(embedding), planes.map(_.toArray).toArray))
}
