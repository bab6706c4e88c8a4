package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge

/** Native AS-OF join (SURVEY.md §2.C `join_asof`; stretch component —
  * custom LogicalPlan + Strategy + SparkPlan per the preference ladder).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest right.ts strictly less than left.ts (ties on ts
  * broken by greatest tiebreak value); unmatched left rows null-extend —
  * identical to the windowed emulation in operators.Relational
  * (`join_asof`), which the oracle checks.
  *
  * Scale: the windowed emulation materializes every (left, earlier-right)
  * pair before ranking — O(pairs-per-key) after the shuffle. This operator
  * hash-partitions both sides on the key, sorts within partitions
  * ((key, ts) / (key, ts, tie) — Spark's existing Exchange + Sort machinery
  * via requiredChildDistribution/Ordering), then streams a single forward
  * merge per partition: O(n log n) total, O(1) state per key. At 100 TB the
  * pair blow-up is the difference between a job that finishes and one that
  * doesn't.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoin =
    copy(left = l, right = r)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // hash-co-partition both sides on the join key…
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // …and sort within partitions so one forward pass suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightArity = right.output.size

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      var buffered: InternalRow = null   // latest right row for current key
      var bufferedKey: Any = null
      var lookahead: InternalRow = null
      def advanceLookahead(): Unit =
        lookahead = if (ri.hasNext) ri.next().copy() else null
      advanceLookahead()

      li.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTs.eval(lRow)
        if (lk == null || lt == null) {
          // SQL join semantics: a null key/ts never matches — null-extend.
          // (Interpreted orderings unbox null to 0, so nulls must never
          // reach the comparators.)
          joined(lRow, nullRight)
        } else {
          // consume right rows that are no longer ahead of this left row
          var continue = true
          while (continue && lookahead != null) {
            val rk = rKey.eval(lookahead)
            val rt = if (rk == null) null else rTs.eval(lookahead)
            if (rk == null || rt == null) {
              advanceLookahead() // null-keyed right rows match nothing
            } else {
              val ck = keyOrd.compare(rk, lk)
              if (ck < 0) {
                advanceLookahead() // right row for an earlier key — discard
              } else if (ck == 0 && tsOrd.compare(rt, lt) < 0) {
                buffered = lookahead; bufferedKey = rk
                advanceLookahead()
              } else {
                continue = false
              }
            }
          }
          if (buffered != null && keyOrd.compare(bufferedKey, lk) == 0 &&
              tsOrd.compare(rTs.eval(buffered), lt) < 0) {
            joined(lRow, buffered)
          } else {
            joined(lRow, nullRight)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofJoinExec =
    copy(left = l, right = r)
}

/** DataFrame-level entry point. Registers the planner strategy on the
  * session (runtime `experimental.extraStrategies` — no builder-time
  * extension needed; `GraftExtensions` offers the builder path too). */
object AsofJoinApi {
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsofStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofStrategy
  }

  /** leftTs/rightTs strictly-before semantics, latest-wins; rightTie breaks
    * equal-ts ties (greatest wins). Column names resolved on each side. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, rightTie: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = Bridge.analyzed(left)
    val rp = Bridge.analyzed(right)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTs), attr(rp, rightTs))
    // fail at plan time, not with a ClassCastException inside the executor
    // orderings: the interpreted comparators assume both sides share a type
    def sameType(what: String, a: Attribute, b: Attribute): Unit =
      if (a.dataType != b.dataType)
        throw new IllegalArgumentException(
          s"asofJoin $what types must match: ${a.name} is ${a.dataType.sql}, " +
            s"${b.name} is ${b.dataType.sql} — cast one side first")
    sameType("key", lk, rk)
    sameType("timestamp", lt, rt)
    Bridge.ofRows(spark, AsofJoin(lp, rp, lk, rk, lt, rt, attr(rp, rightTie)))
  }
}

/** Builder-time registration: SparkSession.builder().withExtensions(new
  * GraftExtensions) — injects the as-of strategy and the cosine_sim SQL
  * function. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsofStrategy)
    e.injectOptimizerRule(_ => CollapseRedundantRound)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => graft.functions.CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => graft.functions.MinHashSig.fromExprs(exprs)))
  }
}
