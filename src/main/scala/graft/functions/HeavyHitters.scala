package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a mergeable Spark `Aggregator`
  * — the custom-UDAF member of the engine's sketch surface
  * (`approx_count_distinct` and `percentile_approx` are built-ins;
  * this one is hand-built because Spark has no frequent-items
  * aggregate).
  *
  * Contract (Misra–Gries '82; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with k counters, after any
  * sequence of inserts and pairwise merges, every item with true
  * frequency > N/k is present in the summary, and each counter
  * under-estimates by at most N/k. The SET of surviving sub-threshold
  * items depends on partitioning — but the superset guarantee for
  * above-threshold items holds under ANY merge order, which is what
  * the oracle checks (partition-independent truth).
  *
  * The buffer is a bounded map (≤ k entries) regardless of input
  * cardinality — constant state per partition, mergeable in O(k), the
  * shape that distributes to any corpus size.
  */
final case class MGSummary(counts: Map[String, Long], decremented: Long)

class MisraGries(k: Int) extends Aggregator[String, MGSummary, Map[String, Long]] {

  override def zero: MGSummary = MGSummary(Map.empty, 0L)

  override def reduce(b: MGSummary, item: String): MGSummary = {
    val m = mutable.Map[String, Long]() ++ b.counts
    if (m.contains(item)) { m(item) += 1; MGSummary(m.toMap, b.decremented) }
    else if (m.size < k) { m(item) = 1L; MGSummary(m.toMap, b.decremented) }
    else {
      // decrement-all: drop every counter by 1, evict zeros
      val dec = m.collect { case (t, c) if c > 1 => (t, c - 1) }
      MGSummary(dec.toMap, b.decremented + 1)
    }
  }

  /** Mergeable-summaries rule: add counters pointwise, then subtract
    * the (k+1)-th largest value from all and evict non-positives —
    * keeps the ≤ k bound and the error bound additive. */
  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    val m = mutable.Map[String, Long]() ++ a.counts
    b.counts.foreach { case (t, c) => m(t) = m.getOrElse(t, 0L) + c }
    if (m.size <= k) MGSummary(m.toMap, a.decremented + b.decremented)
    else {
      val kth = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val kept = m.collect { case (t, c) if c > kth => (t, c - kth) }
      MGSummary(kept.toMap, a.decremented + b.decremented + kth)
    }
  }

  override def finish(r: MGSummary): Map[String, Long] = r.counts

  override def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
