package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join — for each left row, the single most recent right row of
  * the same key with `rightTime <= leftTime` (left-outer semantics).
  *
  * Spark has no relational operator for this (the window-function
  * encoding materializes the union and double-sorts it), so this is
  * the full custom-operator tier: logical node → planner strategy →
  * physical sort-merge exec. The physical plan declares
  * `ClusteredDistribution` + per-partition `(key, time)` ordering and
  * lets EnsureRequirements insert the exchanges/sorts — at cluster
  * scale both sides shuffle once on the key and stream through a
  * single forward-only merge pass: O(1) memory per partition beyond
  * one buffered candidate row, no state blow-up on 100 TB facts.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightArity = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val rBuf = rIter.buffered
      var cand: InternalRow = null
      var candKey: Any = null
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        // Left-outer semantics for nulls: a null left key/time can
        // never match, so emit the null-extended row without touching
        // the right cursor (nulls-first sort puts these rows before
        // any comparable key, so the cursor is still aligned).
        if (lk == null || lt == null) {
          project(joined(lRow, nullRight))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            if (rk == null || rTimeB.eval(head) == null) {
              // a null right key/time matches no left row — drop it
              rBuf.next()
            } else {
              val cmpKey = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
              val take =
                cmpKey < 0 ||
                  (cmpKey == 0 &&
                    timeOrd.compare(rTimeB.eval(head).asInstanceOf[AnyRef], lt.asInstanceOf[AnyRef]) <= 0)
              if (take) {
                val r = rBuf.next()
                // copy BOTH the row and the key: lk may be a
                // buffer-backed value (UTF8String, struct) pointing
                // into the reused left row — without the copy it would
                // mutate to the current left key and stale candidates
                // would match the wrong key
                if (cmpKey == 0) {
                  cand = r.copy()
                  candKey = InternalRow.copyValue(lk)
                }
              } else advance = false
            }
          }
          val matched = cand != null && candKey != null &&
            keyOrd.compare(candKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0
          project(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Catalyst stops pushing predicates at operators it doesn't know, so
  * a filter above [[AsOfJoin]] would run after the join — scanning and
  * shuffling rows the query throws away. This rule splits the
  * conjunction and sinks every left-only predicate below the join
  * (where the built-in rules then carry it into the parquet scan);
  * a left-key equality predicate is additionally mirrored to the right
  * side (the join key must match, so the right side can prune too).
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        // mirror `leftKey = lit` onto the right side through key equality
        val mirrored = leftOnly.collect {
          case EqualTo(a, l: Literal) if a.semanticEquals(aj.leftKey) =>
            EqualTo(aj.rightKey, l)
          case EqualTo(l: Literal, a) if a.semanticEquals(aj.leftKey) =>
            EqualTo(aj.rightKey, l)
        }
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        val newRight =
          if (mirrored.isEmpty) aj.right
          else Filter(mirrored.reduce(And), aj.right)
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

object AsOfJoinOps {
  /** `asofJoin(left, right, "user_id", "pu", "ms", "p_ms")` — left
    * outer as-of. Right column names must not collide with left's
    * (alias the right side first; fresh aliases also keep attribute
    * ids disjoint when both sides read the same table). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join sides share attributes; alias the right side first")
    GraftBridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
