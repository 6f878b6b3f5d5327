package graft

import graft.functions.{AgentText, TextFunctions}
import graft.memory.MemoryStore
import graft.model.{Summary, Topic}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5 tier 2) over the pure functions.
  * ScalaCheck properties run through its own Test runner; a failure
  * reports the shrunk counterexample. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', '-'))).map(_.mkString)

  test("clean_string is idempotent") {
    check("clean idempotent", Prop.forAll(asciiText) { s =>
      val once = TextFunctions.cleanString(s)
      TextFunctions.cleanString(once) == once
    })
  }

  test("keyword tokens never contain stopwords or whitespace") {
    check("keywords", Prop.forAll(asciiText) { s =>
      TextFunctions.getKeywords(s).forall(w =>
        !TextFunctions.englishStopwords.contains(w.toLowerCase) &&
          !w.exists(_.isWhitespace) && w.nonEmpty)
    })
  }

  test("truncate/summarize respect caps") {
    check("caps", Prop.forAll(asciiText, Gen.choose(0, 300)) { (s, n) =>
      AgentText.truncate(s, n).length <= n &&
        AgentText.summarize(s, 200).length <= 203
    })
  }

  test("coercion: int-convertible implies float-convertible; parse agrees") {
    val numLike: Gen[String] = Gen.oneOf(
      Gen.choose(-10000, 10000).map(_.toString),
      Gen.choose(-10000.0, 10000.0).map(_.toString),
      Gen.choose(-100, 100).map(i => s"$i.0"),
      asciiText)
    check("coercion", Prop.forAll(numLike) { s =>
      val intOk = AgentText.isIntConvertible(s)
      val floatOk = AgentText.isFloatConvertible(s)
      (!intOk || floatOk) && {
        if (intOk) AgentText.coerceArg(s, "number").contains(s.toDouble.toLong)
        else if (floatOk) AgentText.coerceArg(s, "number").contains(s.toDouble)
        else AgentText.coerceArg(s, "number").isEmpty
      }
    })
  }

  test("marker extraction output always contains the start marker when found") {
    val marker = Gen.alphaStr.suchThat(_.length >= 2)
    check("markers", Prop.forAll(asciiText, marker, marker) { (body, s, e) =>
      val text = s"$body $s middle $e tail"
      val out = AgentText.extractBetweenMarkers(text, s, e)
      out.isEmpty || out.startsWith(s.take(out.length).take(s.length)) ||
        out.contains(s)
    })
  }

  test("topic merge never exceeds capacity and preserves updated names") {
    val upd: Gen[List[(String, String)]] =
      Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "d", "e", "f"), Gen.alphaStr))
    val ts = new java.sql.Timestamp(1000L)
    check("topics", Prop.forAll(upd, Gen.choose(1, 4)) { (updates, cap) =>
      val merged = MemoryStore.mergeTopics(Seq.empty, "s", updates, ts, cap)
      merged.size <= cap &&
        updates.lastOption.forall { case (n, _) => merged.exists(_.name == n) }
    })
  }

  test("summary retention keeps exactly the newest cap entries") {
    check("retention", Prop.forAll(Gen.choose(1, 5), Gen.choose(1, 30)) { (cap, n) =>
      var s = Seq.empty[Summary]
      (1 to n).foreach { i =>
        s = MemoryStore.retainSummaries(s, Summary("x", new java.sql.Timestamp(i * 1000L), s"t$i"), cap)
      }
      s.size == math.min(cap, n) &&
        s.map(_.text).contains(s"t$n")
    })
  }

  test("json5 parser round-trips what the strict subset produces") {
    val key = Gen.alphaStr.suchThat(_.nonEmpty)
    val value = Gen.oneOf(
      Gen.alphaNumStr.map(v => "\"" + v + "\""),
      Gen.choose(-1000, 1000).map(_.toString),
      Gen.oneOf("true", "false", "null"))
    val objGen = Gen.mapOf(Gen.zip(key, value)).map { m =>
      m.map { case (k, v) => "\"" + k + "\": " + v }.mkString("{", ", ", "}")
    }
    check("json5", Prop.forAll(objGen) { json =>
      AgentText.parseJson5ish(json).isDefined
    })
  }

  test("incremental BPE trainer equals the naive full-recount trainer") {
    import scala.collection.mutable
    def mergeGreedy(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def naive(vocab: Array[(String, Long)], nMerges: Int): Seq[(Int, String, String, Long)] = {
      var words = vocab.toVector.map { case (w, f) => (w.map(_.toString).toVector, f) }
      val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var k = 1
      var done = false
      while (k <= nMerges && !done) {
        val counts = mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (syms, f) =>
          (0 until syms.length - 1).foreach { i =>
            val p = (syms(i), syms(i + 1))
            counts(p) = counts.getOrElse(p, 0L) + f
          }
        }
        if (counts.isEmpty) done = true
        else {
          val (best, cnt) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
          out += ((k, best._1, best._2, cnt))
          words = words.map { case (syms, f) => (mergeGreedy(syms, best._1, best._2), f) }
          k += 1
        }
      }
      out.toSeq
    }
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val vocabGen = Gen.nonEmptyListOf(Gen.zip(wordGen, Gen.choose(1L, 5L)))
      .map(_.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toArray.sortBy(_._1))
    check("bpe incremental == naive", Prop.forAll(vocabGen, Gen.choose(1, 6)) { (vocab, n) =>
      graft.operators.TextAnalysis.bpeTrainIncremental(vocab, n) == naive(vocab, n)
    })
  }
}
