package graft

import graft.functions.{MGSummary, MisraGries}
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantees, exercised directly on the Aggregator's
  * reduce/merge (no Spark session needed) plus one distributed run. */
class HeavyHittersSpec extends AnyFunSuite {

  private def sketch(k: Int, items: Seq[String], chunks: Int): Map[String, Long] = {
    val mg = new MisraGries(k)
    val parts = items.grouped(math.max(1, items.size / chunks)).toSeq
    val merged = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
      .foldLeft(mg.zero)(mg.merge)
    mg.finish(merged)
  }

  test("every above-threshold item survives any partitioning") {
    // skewed stream: item "hot-i" appears 100*(6-i) times, noise once each
    val items = scala.util.Random.shuffle(
      (1 to 5).flatMap(i => Seq.fill(100 * (6 - i))(s"hot$i")) ++
        (1 to 400).map(i => s"noise$i"))
    val n = items.size
    val k = 20
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val qualifying = exact.collect { case (t, c) if c * k > n => t }.toSet
    assert(qualifying.nonEmpty)
    for (chunks <- Seq(1, 3, 8, 17)) {
      val cand = sketch(k, items, chunks).keySet
      assert(qualifying.subsetOf(cand),
        s"chunks=$chunks missing ${qualifying -- cand}")
    }
  }

  test("buffer never exceeds k counters and estimates under-count by at most N/k") {
    val items = (1 to 2000).map(i => s"t${i % 37}")
    val k = 10
    val mg = new MisraGries(k)
    val s = items.foldLeft(mg.zero)(mg.reduce)
    assert(s.counts.size <= k)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    s.counts.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated")
      assert(exact(t) - est <= items.size / k, s"$t undercounted too far")
    }
  }

  test("merge keeps the bound and adds errors no worse than additively") {
    val k = 8
    val mg = new MisraGries(k)
    val a = (1 to 500).map(i => s"a${i % 11}").foldLeft(mg.zero)(mg.reduce)
    val b = (1 to 500).map(i => s"b${i % 13}").foldLeft(mg.zero)(mg.reduce)
    val m = mg.merge(a, b)
    assert(m.counts.size <= k)
    assert(m.decremented >= a.decremented + b.decremented)
  }
}
