package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator tier (c) of the build
  * rules: a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, the same
  * semantics as the composed [[graft.operators.AsOf.joinBackward]]
  * (reference has no as-of; this is the canonical time-series enrichment
  * the training pipeline needs).
  *
  * Why a custom physical operator can beat the composed form at scale:
  * both pay one |L|+|R| key shuffle + sort, but the window composition
  * materializes a unioned row shape (left struct + right struct per row)
  * and runs a window frame over it, while this exec streams the two sorted
  * children through a merge holding exactly ONE buffered right payload per
  * key — O(1) state, no union row blow-up, no window machinery.
  *
  * Catalyst integration: `requiredChildDistribution` asks for co-clustered
  * children (EnsureRequirements inserts compatible hash exchanges exactly
  * like sort-merge join), `requiredChildOrdering` asks for (keys, ts)
  * sort, `outputPartitioning`/`outputOrdering` advertise the left child's,
  * so downstream per-key operators reuse the exchange.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Attribute],
    payloadOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, pay, out) =>
      AsOfJoinExec(lk, rk, lts, rts, pay, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightPayload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nPay = rightPayload.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val payProj = UnsafeProjection.create(rightPayload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPay = new GenericInternalRow(nPay)
      val joined = new JoinedRow
      // downstream exchanges require UnsafeRow: identity projection over
      // the joined shape (same move sort-merge join's resultProj makes)
      val outProj = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered
      // O(1) merge state: the latest right payload (and its key) seen at or
      // before the current left row's (key, ts).
      var heldKey: InternalRow = null
      var heldPay: InternalRow = null
      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTsRow = lTsProj(l).copy()
        var advance = true
        while (advance && rBuf.hasNext) {
          val rKey = rKeyProj(rBuf.head)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) rBuf.next() // right key passed by every future left row
          else if (c == 0 && tsOrd.compare(rTsProj(rBuf.head), lTsRow) <= 0) {
            val r = rBuf.next()
            heldKey = rKeyProj(r).copy()
            heldPay = payProj(r).copy()
          } else advance = false
        }
        val matched = heldKey != null && keyOrd.compare(heldKey, lKey) == 0
        outProj(joined(l, if (matched) heldPay else nullPay))
      }
    }
  }
}

/** Public API over the custom operator. */
object AsOfNative {

  /** Register the strategy on the session (idempotent); also injectable
    * via `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` in the same key group; right `payload` columns
    * are attached as `prefix<name>` (null when no match). Same contract
    * as [[graft.operators.AsOf.joinBackward]]. */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, rightPayload: Seq[String],
           prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join trap: when both sides derive from the same scan they share
    // exprIds, and the analyzer's DeduplicateRelations cannot disambiguate
    // OUR captured key attributes (the name exists on both sides). Re-alias
    // the right output with fresh exprIds up front.
    val rPlan =
      if (rPlan0.output.exists(lPlan.outputSet.contains))
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"column $n not found among ${p.output.map(_.name).mkString(",")}"))
    val pay = rightPayload.map(attr(rPlan, _))
    val payOut = pay.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    GraftSqlBridge.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      keyCols.map(attr(lPlan, _)), keyCols.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs), pay, payOut))
  }
}
