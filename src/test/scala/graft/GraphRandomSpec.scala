package graft

import scala.collection.mutable

import graft.operators.Graph
import org.apache.spark.sql.functions.col

/** Randomized cross-checks of the distributed BFS and k-core peel
  * (operators.Graph) against plain in-memory references over seeded
  * random graphs — the oracle queries pin one dataset; these pin the
  * algorithms (same pattern as CcRandomSpec).
  */
class GraphRandomSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260813L)

  private def randomGraph(): (Int, Seq[(Long, Long)]) = {
    val n = 6 + rnd.nextInt(8)
    val edges = (for {
      u <- 0 until n; v <- u + 1 until n if rnd.nextDouble() < 0.25
    } yield (u.toLong, v.toLong)).toSeq
    (n, edges)
  }

  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                     maxHops: Int): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, mutable.Set.empty) += v
      adj.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    val dist = mutable.Map.empty[Long, Long]
    seeds.foreach(s => dist(s) = 0L)
    var frontier = seeds
    for (d <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d.toLong)
    }
    dist.toMap
  }

  private def refKcore(edges: Seq[(Long, Long)], k: Int,
                       rounds: Int): Map[Long, Long] = {
    var cur = edges
    for (_ <- 1 to rounds) {
      val deg = cur.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      cur = cur.filter(e => deg(e._1) >= k && deg(e._2) >= k)
    }
    cur.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("distributed BFS matches the in-memory reference on random graphs") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val (n, edges) = randomGraph()
      val seeds = (0 until n).filter(_ => rnd.nextDouble() < 0.25)
        .map(_.toLong).toSet + rnd.nextInt(n).toLong
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        val got = Graph.bfs(sym, seeds.toSeq.toDF("node"), maxHops = 4)
          .as[(Long, Long)].collect().toMap
        val want = refBfs(edges, seeds, maxHops = 4)
        assert(got == want, s"trial $trial: n=$n seeds=$seeds edges=$edges")
      }
    }
  }

  test("k-core peel matches the in-memory reference on random graphs") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val (n, edges) = randomGraph()
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        val got = Graph.kcore(sym, k = 2, rounds = 3)
          .as[(Long, Long)].collect().toMap
        val want = refKcore(edges, k = 2, rounds = 3)
        assert(got == want, s"trial $trial: n=$n edges=$edges")
      }
    }
  }
}
