package graft

import org.apache.spark.sql.functions.col

/** Randomized cross-check of the alternating large-star/small-star
  * connected components (Dedup.duplicateClusters) against a plain
  * union-find, over seeded random graphs — the oracle query pins one
  * dataset; this pins the algorithm.
  */
class CcRandomSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum representative
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("duplicateClusters matches union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 5).foreach { trial =>
      val n = 8 + rnd.nextInt(10)
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val docs = (0 until n).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("i", "j")
      val got = graft.operators.Dedup.duplicateClusters(docs, pairs)
        .select(col("doc_id"), col("cluster_rep"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, edges)
      assert(got == want, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("driver union-find path and distributed star path produce the identical labeling") {
    // ccLabels now size-gates to a driver union-find on small graphs,
    // so duplicateClusters above no longer exercises the star rounds —
    // this pins both paths against each other (and the reference
    // union-find) on the same seeded random graphs.
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    (1 to 4).foreach { trial =>
      val n = 10 + rnd.nextInt(14)
      val edges = Seq.fill(rnd.nextInt(3 * n)) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val edges0 = edges.toDF("u", "v").localCheckpoint()
      val viaDriver = graft.operators.Dedup.ccLabelsDriver(edges0)
        .as[(Long, Long)].collect().toMap
      val viaStars = graft.operators.Dedup.ccLabelsStars(edges0)
        .as[(Long, Long)].collect().toMap
      assert(viaDriver == viaStars, s"trial $trial: edges=$edges")
      val want = unionFind(n, edges).filter { case (k, v) => k != v }
      assert(viaDriver == want, s"trial $trial vs union-find: edges=$edges")
    }
  }
}
