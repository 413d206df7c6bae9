package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextAnalysis

/** BPE merge learning: the classic hand example, greedy-fold semantics,
  * tie-breaks, and vocabulary exhaustion. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def learn(texts: Seq[String], merges: Int): Seq[(Long, String, String, Long)] =
    TextAnalysis.bpeLearn(texts.toDF("text"), "text", merges)
      .orderBy("rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("classic low/lower/newest example, ties break lexicographically") {
    // low x3, lower x2, newest x1:
    //  round 1: (l,o)=5 ties (o,w)=5 -> lex smaller lhs wins -> ('l','o')
    //  round 2: (lo,w)=5 -> 'low'
    //  round 3: (low,e)=2 ties (e,r)=2 -> 'e' < 'low' -> ('e','r')
    val corpus = Seq("low low low", "lower lower", "newest")
    assert(learn(corpus, 3) == Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "e", "r", 2L)))
  }

  test("greedy left-to-right merge: aaaa becomes (aa)(aa), never (aaa)a") {
    // round 1: 'aaaa' has 3 (a,a) positions; the fold must not let the
    // freshly merged 'aa' re-match as lhs in the same pass
    val rules = learn(Seq("aaaa"), 2)
    assert(rules == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("exhaustion: stops early when no pairs remain") {
    // single-char words have no pairs after one merge collapses 'ab'
    val rules = learn(Seq("ab ab", "c"), 5)
    assert(rules == Seq((1L, "a", "b", 2L)))
  }

  test("case folding and frequency weighting flow through word counts") {
    // 'Ab' and 'ab' are the same word lowered; weight 3 drives the merge
    val rules = learn(Seq("Ab ab ab", "xy"), 1)
    assert(rules.head == (1L, "a", "b", 3L))
  }
}
