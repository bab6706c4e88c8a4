package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused per-subspace squared-L2: `subspace_l2(a, b, sub)` over two
  * ArrayType(FloatType | DoubleType) columns → array<double> of length
  * n/sub, where element m = Σ_{i<sub} (a[m·sub+i] − b[m·sub+i])², each
  * element widened to double BEFORE subtracting and accumulated
  * sequentially — the exact arithmetic of the `zip_with`+`aggregate` HOF
  * chain it replaces (and of the DuckDB oracle's per-subspace folds), in
  * one codegen loop with no intermediate slice/array allocation. Each
  * side's element width is read from its CHILD TYPE (raw embeddings are
  * float; a Lloyd-trained codebook is exact-mean double).
  *
  * This is the product-quantization hot path (vec_pq_ann): encoding is
  * N×K of these calls, and Spark's higher-order functions are interpreted
  * per element — the HOF formulation cost ~1.7 s warm at sf0.01 vs
  * sub-second through this expression. Same remedy as MinHashSig /
  * CosineSim. Mismatched lengths or a length not divisible by `sub` →
  * null (a PQ codebook always matches its vectors' dimension).
  */
case class SubspaceL2(left: Expression, right: Expression, sub: Int)
    extends BinaryExpression {

  require(sub >= 1, s"subspace_l2 needs sub >= 1 (got $sub)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // non-null inputs can yield null (shape mismatch)

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || n % sub != 0) return null
    val m = n / sub
    val out = new Array[Double](m)
    var j = 0
    while (j < m) {
      var acc = 0.0
      var i = j * sub
      val end = i + sub
      while (i < end) {
        val av = if (isDouble(left)) a.getDouble(i) else a.getFloat(i).toDouble
        val bv = if (isDouble(right)) b.getDouble(i) else b.getFloat(i).toDouble
        val d = av - bv
        acc += d * d
        i += 1
      }
      out(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def getter(arr: String, idx: String, e: Expression): String =
        if (isDouble(e)) s"$arr.getDouble($idx)" else s"(double) $arr.getFloat($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n % $sub != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $m = $n / $sub;
         |  double[] $out = new double[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $acc = 0.0;
         |    int $end = ($j + 1) * $sub;
         |    for (int $i = $j * $sub; $i < $end; $i++) {
         |      double $d = ${getter(a, i, left)} - ${getter(b, i, right)};
         |      $acc += $d * $d;
         |    }
         |    $out[$j] = $acc;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubspaceL2 =
    copy(left = l, right = r)
}

object SubspaceL2 {
  def subspace_l2(a: Column, b: Column, sub: Int): Column =
    Bridge.column(SubspaceL2(Bridge.expression(a), Bridge.expression(b), sub))
}
