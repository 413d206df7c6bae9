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

  test("encode applies merges lowest-rank-first with the greedy fold") {
    import org.apache.spark.sql.functions.col
    val rules = Seq(("a", "b"), ("ab", "ab"), ("c", "d"))
    val out = Seq("abab", "abc", "cd", "x", "", "abcd")
      .toDF("word")
      .select(col("word"),
        graft.functions.BpeEncode.bpe_encode(col("word"), rules).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("abab") == List("abab"))    // (a,b) twice, then (ab,ab)
    assert(out("abc") == List("ab", "c"))
    assert(out("cd") == List("cd"))
    assert(out("x") == List("x"))
    assert(out("") == Nil)
    assert(out("abcd") == List("ab", "cd"))
  }

  test("encode of a learned table reproduces the training segmentation") {
    // learn on a corpus, re-encode the corpus's own words: every word's
    // token sequence must equal the trained vocabulary's final symbols —
    // train and apply share one fold, so fertility audits are exact
    val corpus = Seq("low low low", "lower lower", "newest")
    val rules = TextAnalysis.bpeLearn(corpus.toDF("text"), "text", 3)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Seq("low", "lower", "newest").toDF("word")
      .select(org.apache.spark.sql.functions.col("word"),
        graft.functions.BpeEncode.bpe_encode(
          org.apache.spark.sql.functions.col("word"), rules).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // rules: (l,o), (lo,w), (e,r)
    assert(enc("low") == List("low"))
    assert(enc("lower") == List("low", "er"))
    // 'newest' contains none of the learned pairs adjacently -> chars
    assert(enc("newest") == List("n", "e", "w", "e", "s", "t"), enc("newest"))
  }

  test("bpeTokenCounts: vocabulary-encode + join-back rollup") {
    val docs = Seq((1L, "ab ab cd"), (2L, "ab x")).toDF("doc_id", "text")
    val rules = Seq((1L, "a", "b")).toDF("rank", "lhs", "rhs")
    val out = TextAnalysis.bpeTokenCounts(docs, "text", "doc_id", rules)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: words ab,ab,cd -> tokens 1+1+2 = 4; doc 2: ab,x -> 1+1 = 2
    assert(out == Map(1L -> ((3L, 4L)), 2L -> ((2L, 2L))), out)
  }

  test("randomized corpora: local and distributed paths never drift") {
    // seeded generative net over a tiny alphabet (maximizes pair ties and
    // deep merge chains — the divergence-prone regime); any ordering or
    // fold mismatch between the driver-local incremental loop and the
    // distributed rounds shows up as a table diff
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = for {
      n <- Gen.choose(1, 7)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield cs.mkString
    val corpusGen = for {
      n <- Gen.choose(3, 12)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val params = Gen.Parameters.default
    for (i <- 1 to 12) {
      val corpus = (1 to 3).map(j =>
        corpusGen.pureApply(params, Seed(i.toLong * 100 + j)))
      def run(limit: Long) =
        TextAnalysis.bpeLearn(corpus.toDF("text"), "text", merges = 10,
            driverVocabLimit = limit)
          .orderBy("rank").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSeq
      val l = run(Long.MaxValue)
      val d = run(0L)
      assert(l == d, s"seed $i diverged:\nlocal: $l\ndist:  $d\n($corpus)")
    }
  }

  test("driver-local and distributed paths produce byte-identical merge tables") {
    // a corpus exercising ties, repeats, overlaps, and exhaustion — run
    // deep enough that the vocabulary fully collapses; driverVocabLimit=0
    // forces the distributed loop on the same input
    val corpus = Seq("low low low", "lower lower", "newest", "aaaa aaaa",
      "banana bandana", "abc bca cab", "zz zz yz")
    def run(limit: Long) =
      TextAnalysis.bpeLearn(corpus.toDF("text"), "text", merges = 25,
          driverVocabLimit = limit)
        .orderBy("rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    val local = run(Long.MaxValue)
    val distributed = run(0L)
    assert(local == distributed,
      s"path divergence:\nlocal: $local\ndist:  $distributed")
    assert(local.nonEmpty && local.size <= 25)
  }

  test("unigram segment: integer-DP Viterbi, UNK floor, deterministic ties") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.UnigramSegment.unigram_segment
    // scores in micro-lns: ab/cd strong, chars weak, straddle ba weaker
    val pieces = Seq("ab" -> -1000000L, "cd" -> -1500000L,
      "ba" -> -3000000L, "a" -> -4000000L, "b" -> -4000000L,
      "c" -> -4000000L, "d" -> -4000000L)
    def seg(w: String): Seq[String] =
      Seq(w).toDF("w").select(unigram_segment(col("w"), pieces).as("s"))
        .collect()(0).getSeq[String](0)
    assert(seg("abab") == Seq("ab", "ab"))
    assert(seg("abcd") == Seq("ab", "cd"))
    // ab(−1)+a(−4) = −5 beats a(−4)+ba(−3) = −7
    assert(seg("aba") == Seq("ab", "a"))
    // uncovered char emits itself at the UNK floor rather than failing
    assert(seg("abxcd") == Seq("ab", "x", "cd"))
    assert(seg("") == Seq())
    // equal-score tie: fewer pieces wins ('zz' one piece vs 'z','z')
    val tie = Seq("zz" -> -2000000L, "z" -> -1000000L)
    val t = Seq("zz").toDF("w")
      .select(unigram_segment(col("w"), tie).as("s"))
      .collect()(0).getSeq[String](0)
    assert(t == Seq("zz"), s"tie broke to $t")
  }

  test("unigram LM learn: planted pieces win mass; straddles prune; fixed point") {
    // 'ab'^2 x3 docs + 'cd'^3 x2 docs
    val docs = Seq("abab abab", "cdcdcd", "abab cdcdcd").toDF("text")
    val out = TextAnalysis.unigramLmLearn(docs, "text", maxPieceLen = 2,
      seedSize = 8, rounds = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // straddle pieces ba/dc pruned; chars at the floor
    assert(!out.contains("ba") && !out.contains("dc"))
    assert(out("a") == (0L, -25.0) && out("d") == (0L, -25.0))
    // counts: ab = 2+2+2 = 6, cd = 3+3 = 6 (word 'abab' x3 occurrences,
    // 'cdcdcd' x2)
    assert(out("ab")._1 == 6 && out("cd")._1 == 6)
    assert(out("ab")._2 == out("cd")._2, "equal mass, equal logprob")
    assert(math.abs(out("ab")._2 - math.log(0.5)) < 1e-6)
    // apply step: per-doc piece counts under the learned table
    val learned = out.map { case (p, (_, lp)) =>
      p -> math.floor(lp * 1000000.0 + 0.5).toLong }.toSeq
    val idDocs = Seq((0L, "abab abab"), (1L, "cdcdcd"), (2L, "abab cdcdcd"))
      .toDF("doc_id", "text")
    val tc = TextAnalysis.unigramTokenCounts(idDocs, "text", "doc_id", learned)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tc(0L) == (2L, 4L) && tc(1L) == (1L, 3L) && tc(2L) == (2L, 5L))
  }
}
