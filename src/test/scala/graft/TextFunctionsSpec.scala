package graft

import graft.functions.TextFunctions._
import graft.operators.SimpleRag
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Python-parity tests for the text primitives (reference
  * utils.py:249-330; quirks SURVEY.md §8 Q2/Q4/Q5/Q13).
  */
class TextFunctionsSpec extends AnyFunSuite {

  test("bpeTrainIncremental: greedy overlap, freq weighting, tie-break") {
    // "aaa" x2: pairs (a,a) count 4 -> merge 1 = (a,a); greedy left-to-right
    // leaves [aa, a], so merge 2 sees (aa, a) count 2, plus "ab" x3 -> (a,b) 3.
    val vocab = Array(("aaa", 2L), ("ab", 3L))
    val m = graft.operators.TextAnalysis.bpeTrainIncremental(vocab, 3)
    assert(m(0) == ((1, "a", "a", 4L)))
    assert(m(1) == ((2, "a", "b", 3L)))
    assert(m(2) == ((3, "aa", "a", 2L)))
    // ties break on (a, b) string order: (x,y) and (y,x) both count 1
    val m2 = graft.operators.TextAnalysis.bpeTrainIncremental(Array(("xyx", 1L)), 1)
    assert(m2(0) == ((1, "x", "y", 1L)))
    // merge supply exhausts cleanly below nMerges
    val m3 = graft.operators.TextAnalysis.bpeTrainIncremental(Array(("ab", 1L)), 5)
    assert(m3.map(t => (t._1, t._2, t._3)) == Seq((1, "a", "b")))
  }

  test("cleanString strips punctuation and lowercases (utils.py:249-252)") {
    assert(cleanString("Hello, World! 42_x") == "hello world 42_x")
    assert(cleanString("a.b,c;d") == "abcd")
  }

  test("getKeywords drops English stopwords, keeps duplicates") {
    assert(getKeywords("the quick fox") == Seq("quick", "fox"))
    assert(getKeywords("wo d1") == Seq("wo", "d1"))
    // duplicates preserved (scoring counts them per occurrence)
    assert(getKeywords("fox fox") == Seq("fox", "fox"))
    // 'word' AND 'other' are both in the reference stop list (utils.py:264,267)
    assert(getKeywords("word other") == Seq())
  }

  test("getKeywords tokenizes CJK per-char with stop-chars (intended Q2 semantics)") {
    // 的 is a stop char; 猫 is not.
    assert(getKeywords("猫的abc") == Seq("猫", "abc"))
  }

  test("getKeywords emits punctuation as its own token (non-space, non-alnum)") {
    // 'a' is a stopword; the dash is kept as its own token (utils.py:309-311)
    assert(getKeywords("a-b") == Seq("-", "b"))
  }
}

/** Golden test #1 (SURVEY.md §5): the reference's only test fixture,
  * semantics derived by hand-executing utils.py:249-330.
  */
class SimpleRagGoldenSpec extends SparkSpec {

  test("simple_rag over a CJK corpus (intended Q2 semantics end-to-end)") {
    import spark.implicits._
    // 的 is a stop char (dropped from the query); 猫/狗 are content chars
    val corpus = Seq(
      (0L, "我家的猫很可爱"), (1L, "狗在院子里"), (2L, "猫和狗都在"),
      (3L, "今天天气很好")).toDF("doc_id", "text")
    val got = operators.SimpleRag.topK(corpus, "doc_id", "text", "猫的狗", 2)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // keywords = [猫, 狗]; doc 2 contains both (score 2); docs 0,1 score 1
    // (tie broken by doc_id → doc 0)
    assert(got == Seq((2L, 2L), (0L, 1L)))
  }
  test("simple_rag('wo d1', corpus, 3) matches the reference golden") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "abc"), (1L, "bca"), (2L, "word"),
      (3L, "word1, wo"), (4L, "word2"), (5L, "word3"))
      .toDF("doc_id", "text")
    val got = SimpleRag
      .topK(corpus, "doc_id", "text", "wo d1", 3)
      .select("doc_id", "cleaned", "score")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    // Q13: returns CLEANED text; Q5: ties keep input order.
    assert(got == Seq((3L, "word1 wo", 2L), (2L, "word", 1L), (4L, "word2", 1L)))
  }

  test("keywordScore counts substring containment once per keyword (Q4)") {
    import spark.implicits._
    val df = Seq("word1 wo").toDF("t")
      .select(keywordScore(col("t"), Seq("wo", "d1")).as("s"))
    assert(df.head().getInt(0) == 2)
    // keyword occurring twice in text still scores 1
    val df2 = Seq("wo wo").toDF("t")
      .select(keywordScore(col("t"), Seq("wo")).as("s"))
    assert(df2.head().getInt(0) == 1)
  }
}
