package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PCA: top principal component of the embedding cloud by
  * covariance aggregation + fixed-iteration power method.
  *
  * The scale story is the covariance build: center each coordinate,
  * then aggregate the d×d outer products — one self-join on the row
  * id (each side d entries, so the join emits d² terms per vector)
  * feeding a (i,j)-keyed DECIMAL sum. That is the classic
  * data-parallel Gram/covariance shape: state is d² cells regardless
  * of row count, the join key is the row id (uniform, no skew), and
  * everything after it — three power-method matvecs, Rayleigh
  * quotient, trace — touches only the d²-cell table, broadcast-sized
  * for any sane d. Every matvec entry and norm is a DECIMAL-routed
  * sum (float dot products are order-sensitive; the decimal snap makes
  * them partitioning-independent and bit-equal to the unrolled DuckDB
  * CTEs). Measured here: explained variance ≈ 1/d — the synthetic
  * embeddings are isotropic, and the readout says so honestly.
  */
object Pca {

  private val dim = 64
  private val v0 = 1.0 / 8 // unit-norm all-ones start: 1/√64, exact in binary

  /** Snap a double summand to the 1e-9 grid BEFORE its decimal cast:
    * a snapped value is within an ulp of a scale-9-exact decimal, so
    * both engines' double→DECIMAL conversions land on the identical
    * digits (full-precision products can disagree in the conversion's
    * double-rounding zone — the same fix as the STL detrend snap). */
  private def snap(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * lit(1e9)) / lit(1e9)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sim_pca_power", {
        def matvec(vPrev: String, k: Int): String =
          s"""w$k AS (
            SELECT c.i, CAST(SUM(CAST(round(c.cij * v.v * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE) AS w
            FROM cov c JOIN $vPrev v ON v.j = c.j GROUP BY c.i),
          n$k AS (
            SELECT sqrt(CAST(SUM(CAST(round(w * w * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
            FROM w$k),
          v$k AS (SELECT i AS j, w / nrm AS v FROM w$k CROSS JOIN n$k)"""
        Some(s"""
          WITH x AS (
            SELECT e.vec_id, t.d AS i, CAST(e.embedding[t.d + 1] AS DOUBLE) AS xi
            FROM embeddings e, range(0, $dim) t(d)),
          nn AS (SELECT COUNT(*) AS n FROM embeddings),
          mu AS (
            SELECT i, CAST(SUM(CAST(round(xi * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE) / n AS mu
            FROM x CROSS JOIN nn GROUP BY i, n),
          xc AS (SELECT x.vec_id, x.i, x.xi - mu.mu AS c
                 FROM x JOIN mu ON mu.i = x.i),
          cov AS (
            SELECT a.i, b.i AS j,
                   CAST(SUM(CAST(round(a.c * b.c * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE) / n AS cij
            FROM xc a JOIN xc b ON a.vec_id = b.vec_id CROSS JOIN nn
            GROUP BY a.i, b.i, n),
          v00 AS (SELECT i AS j, CAST($v0 AS DOUBLE) AS v FROM mu),
          ${matvec("v00", 1)},
          ${matvec("v1", 2)},
          ${matvec("v2", 3)},
          lam AS (
            SELECT CAST(SUM(CAST(round(vi.v * c.cij * vj.v * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE) AS lambda
            FROM cov c JOIN v3 vi ON vi.j = c.i JOIN v3 vj ON vj.j = c.j),
          tr AS (
            SELECT CAST(SUM(CAST(round(cij * 1e9) / 1e9 AS DECIMAL(38,12))) AS DOUBLE) AS trace
            FROM cov WHERE i = j)
          SELECT CAST(v3.j AS BIGINT) AS dim, v3.v AS loading,
                 lam.lambda, tr.trace, lam.lambda / tr.trace AS explained
          FROM v3 CROSS JOIN lam CROSS JOIN tr
          ORDER BY dim
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val dec = DecimalType(38, 12)
        val x = embeddings(s, d)
          .select($"vec_id", posexplode($"embedding").as(Seq("i", "xf")))
          .select($"vec_id", $"i", $"xf".cast("double").as("xi"))
        val nn = embeddings(s, d).agg(count(lit(1)).as("n"))
        val mu = x.crossJoin(broadcast(nn)).groupBy($"i", $"n")
          .agg((sum(snap($"xi").cast(dec)).cast("double") / $"n").as("mu"))
          .select($"i", $"mu")
        val xc = x.join(broadcast(mu), "i")
          .select($"vec_id", $"i", ($"xi" - $"mu").as("c"))
        val cov = xc.as("a").join(xc.as("b"), $"a.vec_id" === $"b.vec_id")
          .crossJoin(broadcast(nn))
          .groupBy($"a.i".as("i"), $"b.i".as("j"), $"n")
          .agg((sum(snap($"a.c" * $"b.c").cast(dec)).cast("double") / $"n").as("cij"))
          .select($"i", $"j", $"cij")
          .persist()
        var v: DataFrame = mu.select($"i".as("j"), lit(v0).cast("double").as("v"))
        for (_ <- 1 to 3) {
          val w = cov.as("c").join(broadcast(v.as("v")), $"v.j" === $"c.j")
            .groupBy($"c.i".as("i"))
            .agg(sum(snap($"cij" * $"v").cast(dec)).cast("double").as("w"))
          val nrm = w.agg(sqrt(sum(snap($"w" * $"w").cast(dec)).cast("double")).as("nrm"))
          v = w.crossJoin(broadcast(nrm)).select($"i".as("j"), ($"w" / $"nrm").as("v"))
        }
        val vv = v.persist()
        val lam = cov.as("c")
          .join(broadcast(vv.as("vi")), $"vi.j" === $"c.i")
          .join(broadcast(vv.as("vj")), $"vj.j" === $"c.j")
          .agg(sum(snap($"vi.v" * $"cij" * $"vj.v").cast(dec)).cast("double").as("lambda"))
        val tr = cov.filter($"i" === $"j")
          .agg(sum(snap($"cij").cast(dec)).cast("double").as("trace"))
        val out = vv.crossJoin(broadcast(lam)).crossJoin(broadcast(tr))
          .select($"j".cast("long").as("dim"), $"v".as("loading"),
            $"lambda", $"trace", ($"lambda" / $"trace").as("explained"))
          .orderBy($"dim")
        out
      }))
}
