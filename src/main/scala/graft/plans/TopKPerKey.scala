package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.SparkPlan

/** Grouped top-k as a first-class physical operator.
  *
  * Spark expresses "top k per key" as
  * `filter(row_number().over(partitionBy(key).orderBy(ord)) <= k)` —
  * correct, but the Window operator shuffles EVERY row of the fact
  * table before discarding all but k per key. At 100 TB that shuffle
  * is the job. This strategy recognizes exactly that logical pattern
  * and plans:
  *
  *   TopKFinalExec (streaming pass over sorted, shuffled runs)
  *     +- Exchange hashpartitioning(key)    [inserted by Spark]
  *        +- SortExec(key, ord)             [inserted by Spark]
  *           +- TopKPartialExec (per-partition bounded heaps, ≤k/key)
  *
  * The partial operator prunes map-side — the shuffle carries at most
  * k·keys·partitions rows instead of everything — and the final pass
  * re-ranks after the merge. Results (including the rank column) are
  * identical to the Window formulation; TopKStrategySpec asserts
  * row-level equality.
  */
object TopKStrategy extends SparkStrategy {

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(cond,
        w @ Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(),
            WindowSpecDefinition(partSpec, orderSpec,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partSpec2, orderSpec2, child, _))
        if partSpec == partSpec2 && orderSpec == orderSpec2 =>
      extractLimit(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && partSpec.nonEmpty =>
          // Spark's InferWindowGroupLimit may already have inserted its
          // own prune below the Window — our partial subsumes it
          val bare = child match {
            case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
              wgl.child
            case other => other
          }
          val partial = TopKPartialExec(partSpec, orderSpec, k, planLater(bare))
          TopKFinalExec(partSpec, orderSpec, k, alias.toAttribute, partial) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  /** Match `rn <= k` / `rn < k+1` / `k >= rn` over the rank attribute. */
  private def extractLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }
}

/** Map-side prune: per input partition, keep at most k rows per key —
  * the k smallest under orderSpec, maintained in a bounded heap. */
final case class TopKPartialExec(
    partSpec: Seq[Expression], orderSpec: Seq[SortOrder], k: Int, child: SparkPlan)
    extends SparkPlan {

  override def output: Seq[Attribute] = child.output
  override def children: Seq[SparkPlan] = Seq(child)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildrenInternal(c: IndexedSeq[SparkPlan]): SparkPlan =
    copy(child = c.head)

  override protected def doExecute(): RDD[InternalRow] = {
    val partExprs = partSpec
    val orderExprs = orderSpec
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions ({ it =>
      val keyProj = GenerateUnsafeProjection.generate(partExprs, childOutput)
      val rowOrdering = RowOrdering.create(orderExprs, childOutput)
      // max-heap under orderSpec: the head is the WORST retained row,
      // evicted when a better one arrives
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            limit + 1, rowOrdering.reverse.asInstanceOf[java.util.Comparator[InternalRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = Seq.newBuilder[InternalRow]
      heaps.values.forEach(h => h.forEach(r => out += r))
      out.result().iterator
    }, preservesPartitioning = true)
  }
}

/** Final pass: requires clustering by key and a (key, order) sort —
  * Spark inserts the Exchange and Sort — then emits the first k rows
  * of each key run with the rank appended (the Window's row_number
  * attribute, so downstream operators resolve unchanged). */
final case class TopKFinalExec(
    partSpec: Seq[Expression], orderSpec: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan)
    extends SparkPlan {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def children: Seq[SparkPlan] = Seq(child)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partSpec.isEmpty) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(partSpec))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partSpec.map(SortOrder(_, Ascending)) ++ orderSpec)
  override protected def withNewChildrenInternal(c: IndexedSeq[SparkPlan]): SparkPlan =
    copy(child = c.head)

  override protected def doExecute(): RDD[InternalRow] = {
    val partExprs = partSpec
    val childOutput = child.output
    val limit = k
    val outAttrs = output
    child.execute().mapPartitions ({ it =>
      val keyProj = GenerateUnsafeProjection.generate(partExprs, childOutput)
      // downstream operators (and SparkPlan collect paths) expect
      // UnsafeRow — project the joined (row, rank) through codegen
      val outProj = GenerateUnsafeProjection.generate(outAttrs, outAttrs)
      val joined = new JoinedRow
      var currentKey: UnsafeRow = null
      var rank = 0
      it.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy(); rank = 0
        }
        rank += 1
        if (rank <= limit) {
          val rankRow = InternalRow(rank)
          Some(outProj(joined(row, rankRow)).asInstanceOf[InternalRow])
        } else None
      }
    }, preservesPartitioning = true)
  }
}
