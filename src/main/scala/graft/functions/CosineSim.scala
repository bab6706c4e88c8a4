package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** §2.J `expr_custom`: native Catalyst expression `cosine_sim(a, b)` over
  * two ArrayType(FloatType) columns, with whole-stage codegen.
  *
  * Semantics (bit-exact with the HOF fallback in VectorOps and the DuckDB
  * oracle): sequential left-to-right double accumulation of dot product and
  * both squared norms — each float widened to double before multiply —
  * then dot / (sqrt(na) * sqrt(nb)). Mismatched/null inputs → null.
  *
  * This is the 100 TB performance lever for similarity search: one fused
  * loop over the two arrays inside the scan's codegen stage, versus the
  * zip_with+aggregate HOF chain which allocates an intermediate array per
  * row.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // can produce null for NON-null inputs (dimension mismatch, null
  // element): without this, non-nullable children make ev.isNull a
  // FalseLiteral and the generated `false = true;` fails to compile
  override def nullable: Boolean = true

  /** true when either input's element type admits nulls — only then do we
    * pay the per-element null check in the hot loop. */
  private def elemMayBeNull: Boolean = Seq(left.dataType, right.dataType).exists {
    case org.apache.spark.sql.types.ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null // dimension mismatch → null, not prefix
    val checkNulls = elemMayBeNull
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // compile the element null check out entirely when the schema says
      // containsNull = false (the common embeddings case)
      val nullCheck =
        if (elemMayBeNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** Register `cosine_sim` for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
}
