package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau–Levenshtein distance as a native codegen'd
  * expression: `damerau_levenshtein(a, b)` — edit distance where a
  * transposition of two adjacent characters costs 1, the model for the
  * single most common human typo class. Spark ships plain `levenshtein`
  * only; the gap between the two IS the transposition signal a fuzzy
  * dedup ranks on.
  *
  * Semantics pinned to DuckDB's `damerau_levenshtein` (the oracle twin):
  * the TRUE (unrestricted) variant via the Lowrance–Wagner alphabet-map
  * DP — `dl("CA","ABC") = 2`, where the restricted OSA variant says 3
  * (pinned in the spec; both engines agree on 2). O(|a|·|b|) time, two
  * rows + a last-seen map of working state per call — fine for the
  * name/title-length strings fuzzy matching scores; same static-kernel
  * codegen shape as [[JaroWinkler]].
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.dl(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauLevenshtein.dl($a, $b)")

  override def prettyName: String = "damerau_levenshtein"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** Static kernel shared by eval and generated code (Lowrance–Wagner). */
  def dl(ua: UTF8String, ub: UTF8String): Long = {
    val s = ua.toString
    val t = ub.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0) return l2.toLong
    if (l2 == 0) return l1.toLong
    val inf = l1 + l2
    // (l1+2) x (l2+2) DP with the classic sentinel border
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Char, Int]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = da.getOrDefault(t.charAt(j - 1), 0)
        val l = db
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(s.charAt(i - 1), i)
      i += 1
    }
    d(l1 + 1)(l2 + 1).toLong
  }

  /** Damerau–Levenshtein distance of two string columns. */
  def dl(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))
}
