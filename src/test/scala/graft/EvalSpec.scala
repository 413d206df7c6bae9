package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Eval

/** Generation-eval metric semantics on hand-computed fixtures. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rougeN n=1: clipped unigram P/R/F1") {
    val pairs = Seq(
      (1L, "the cat sat", "the cat ate food"),
      (2L, "same words here", "same words here"), // identical -> all 1
      (3L, "", "some reference"),                 // empty cand -> nulls
      (4L, "x y z", "a b c"))                     // disjoint -> F1 = 0
      .toDF("pair_id", "cand", "ref")
    val out = Eval.rougeN(pairs, "pair_id", "cand", "ref", n = 1)
      .orderBy("pair_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // pair 1: match {the, cat} = 2 of cand 3 / ref 4
    assert(byId(1L).getLong(3) == 2)
    assert(byId(1L).getDouble(4) == 0.666667) // floor(2e6/3 + .5)
    assert(byId(1L).getDouble(5) == 0.5)
    assert(byId(1L).getDouble(6) == 0.571429) // harmonic of the micros
    assert(byId(2L).getDouble(6) == 1.0)
    assert(byId(3L).getLong(1) == 0 && byId(3L).isNullAt(4) &&
      byId(3L).isNullAt(6))
    assert(byId(4L).getDouble(6) == 0.0)
  }

  test("rougeN n=2: multiset clipping keeps duplicate grams") {
    // cand bigrams {ab:1, bc:2, cb:1}; ref {ab:1, bc:2, cd:1, db:1}
    // match = 1 + 2 = 3; P = 3/4, R = 3/5
    val pairs = Seq((1L, "a b c b c", "a b c d b c"))
      .toDF("pair_id", "cand", "ref")
    val r = Eval.rougeN(pairs, "pair_id", "cand", "ref", n = 2).collect()(0)
    assert(r.getLong(1) == 4 && r.getLong(2) == 5 && r.getLong(3) == 3)
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 0.6)
    assert(r.getDouble(6) == 0.666667)
  }

  test("bleu: perfect match = 1; order destroyed -> only p1 survives") {
    val pairs = Seq(
      (1L, "a b c d e", "a b c d e"),
      (2L, "e d c b a", "a b c d e")) // reversed: p1 = 1, p2 m = 0
      .toDF("pair_id", "cand", "ref")
    val out = Eval.bleu(pairs, "pair_id", "cand", "ref")
      .orderBy("pair_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(7) == 1.0 && byId(1L).getDouble(8) == 1.0)
    // reversed: p1 = 1.0; p2..p4 smoothed (0+1)/(c+1): 1/5, 1/4, 1/3
    assert(byId(2L).getDouble(3) == 1.0)
    assert(byId(2L).getDouble(4) == 0.2)
    assert(byId(2L).getDouble(5) == 0.25)
    assert(byId(2L).getDouble(6) == 0.333333)
    assert(byId(2L).getDouble(8) < 0.45 && byId(2L).getDouble(8) > 0.0)
  }

  test("bleu: brevity penalty and degenerate candidates") {
    val pairs = Seq(
      (1L, "a b c", "a b c d"), // c=3 < r=4: bp = exp(-1/3), all pn = 1
      (2L, "x y", "a b"),       // disjoint: p1 = 0 -> bleu 0, bp 1
      (3L, "", "a b"))          // empty cand: bleu 0, bp 0
      .toDF("pair_id", "cand", "ref")
    val out = Eval.bleu(pairs, "pair_id", "cand", "ref")
      .orderBy("pair_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 4)
    assert(byId(1L).getDouble(3) == 1.0 && byId(1L).getDouble(6) == 1.0)
    assert(byId(1L).getDouble(7) == 0.716531) // round(exp(-1/3), 6)
    assert(byId(1L).getDouble(8) == 0.716531)
    assert(byId(2L).getDouble(3) == 0.0 && byId(2L).getDouble(7) == 1.0 &&
      byId(2L).getDouble(8) == 0.0)
    assert(byId(3L).getLong(1) == 0 && byId(3L).getDouble(7) == 0.0 &&
      byId(3L).getDouble(8) == 0.0)
  }

  test("passAtK: closed-form values, saturation, and undefined n<k") {
    // problem 1: n=4, c=1 -> pass@1 = 1 - 3/4 = 0.25;
    //   pass@3 = 1 - (3*2*1)/(4*3*2) = 0.75
    // problem 2: n=4, c=2 -> n-c=2 < 3 -> pass@3 = 1 exactly
    // problem 3: n=2 -> pass@3 undefined (null)
    val samples = Seq(
      (1L, 1), (1L, 0), (1L, 0), (1L, 0),
      (2L, 1), (2L, 1), (2L, 0), (2L, 0),
      (3L, 0), (3L, 1)).toDF("problem_id", "p")
    val out = Eval.passAtK(samples, "problem_id", "p", ks = Seq(1, 3))
      .orderBy("problem_id").collect()
    assert(out(0).getDouble(3) == 0.25 && out(0).getDouble(4) == 0.75)
    assert(out(1).getDouble(4) == 1.0)
    assert(out(2).getDouble(3) == 0.5 && out(2).isNullAt(4))
  }

  test("classificationReport: confusion algebra and macro row") {
    // truth a: 3 (2 as a, 1 as b); truth b: 1 (as b); c predicted never
    // truth-present but... use: truth {a,a,a,b}, pred {a,a,b,b}
    val scored = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("truth", "pred")
    val out = Eval.classificationReport(scored, "truth", "pred")
      .orderBy("label").collect()
    val byL = out.map(r => r.getString(0) -> r).toMap
    val a = byL("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2 && a.getLong(3) == 2)
    assert(a.getDouble(4) == 1.0)      // 2/2 predicted-a correct
    assert(a.getDouble(5) == 0.666667) // 2/3 truth-a recovered
    assert(a.getDouble(6) == 0.8)      // 2*1e6*666667/(1666667) = 800000.2->800000
    val b = byL("b")
    assert(b.getDouble(4) == 0.5 && b.getDouble(5) == 1.0)
    assert(b.getDouble(6) == 0.666667)
    val m = byL("__macro__")
    assert(m.getLong(1) == 4 && m.getLong(3) == 3)
    assert(m.getDouble(4) == 0.75)     // (1e6 + 5e5)/2
    assert(m.getDouble(5) == 0.833334) // (666667+1000000)/2 = 833333.5 -> 833334
    assert(m.getDouble(6) == 0.733334) // (800000+666667)/2 = 733333.5 -> 733334
  }

  test("classificationReport: never-predicted and never-true classes") {
    val scored = Seq(("a", "a"), ("a", "c"), ("b", "a"))
      .toDF("truth", "pred")
    val out = Eval.classificationReport(scored, "truth", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("b").getLong(2) == 0 && out("b").isNullAt(4) &&
      out("b").getDouble(5) == 0.0 && out("b").isNullAt(6))
    assert(out("c").getLong(1) == 0 && out("c").isNullAt(5))
    // macro only over truth-present classes (a, b), null pm counts as 0
    assert(out("__macro__").getLong(1) == 3)
  }

  private def chrfRef(cand: String, ref: String): (Double, Double, Double) = {
    def grams(s: String, n: Int): Map[String, Int] =
      if (s.length < n) Map.empty
      else s.sliding(n).toSeq.groupBy(identity).map { case (g, o) => g -> o.size }
    val (pms, rms) = (1 to 6).map { n =>
      val (cg, rg) = (grams(cand, n), grams(ref, n))
      val m = cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0)) }.sum
      val cn = cg.values.sum; val rn = rg.values.sum
      (if (cn > 0) math.floor(m.toDouble * 1000000.0 / cn + 0.5).toLong else 0L,
        if (rn > 0) math.floor(m.toDouble * 1000000.0 / rn + 0.5).toLong else 0L)
    }.unzip
    val pm = math.floor(pms.sum.toDouble / 6 + 0.5).toLong
    val rm = math.floor(rms.sum.toDouble / 6 + 0.5).toLong
    val f = if (pm * 4 + rm > 0)
      math.floor((pm * rm * 5L).toDouble / (pm * 4 + rm) + 0.5) / 1000000.0
    else 0.0
    (pm / 1000000.0, rm / 1000000.0, f)
  }

  test("chrF: identical = 1, empty = 0, randomized vs reference") {
    val pairs = Seq(
      (1L, "abcdefgh", "abcdefgh"),
      (2L, "", "abc"),
      (3L, "ab cd", "abcd")) // whitespace strips before gramming
      .toDF("pair_id", "cand", "ref")
    val out = Eval.chrF(pairs, "pair_id", "cand", "ref")
      .orderBy("pair_id").collect()
    assert(out(0).getDouble(5) == 1.0)
    assert(out(1).getLong(1) == 0 && out(1).getDouble(5) == 0.0)
    val (p3, r3, f3) = chrfRef("abcd", "abcd")
    assert(out(2).getDouble(3) == p3 && out(2).getDouble(4) == r3 &&
      out(2).getDouble(5) == f3) // strip makes them identical
    val rnd = new scala.util.Random(65)
    val cases = (10 until 110).map { i =>
      def str() = Seq.fill(rnd.nextInt(11))("ab" (rnd.nextInt(2))).mkString
      (i.toLong, str(), str())
    }
    val got = Eval.chrF(cases.toDF("pair_id", "cand", "ref"),
      "pair_id", "cand", "ref").collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4),
        r.getDouble(5))).toMap
    cases.foreach { case (id, c, r) =>
      assert(got(id) == chrfRef(c, r), s"chrF mismatch on ($c | $r)")
    }
  }

  test("rocAuc: hand cases — perfect, random, tied") {
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1))
      .toDF("score", "y")
    val p = Eval.rocAuc(perfect, "score", "y").collect()(0)
    assert(p.getLong(0) == 2 && p.getLong(1) == 2 && p.getDouble(2) == 1.0)
    // all scores tied -> midranks give exactly 0.5
    val tied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)).toDF("score", "y")
    assert(Eval.rocAuc(tied, "score", "y").collect()(0).getDouble(2) == 0.5)
    // single class -> null
    val mono = Seq((0.3, 1), (0.7, 1)).toDF("score", "y")
    assert(Eval.rocAuc(mono, "score", "y").collect()(0).isNullAt(2))
  }

  test("rocAuc: randomized agreement with brute-force pair counting") {
    val rnd = new scala.util.Random(64)
    val rows = Seq.fill(300)((rnd.nextInt(20) / 20.0,
      if (rnd.nextBoolean()) 1 else 0))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = math.floor(wins * 2 * 1000000.0 / (pos.size * neg.size * 2)
      + 0.5) / 1000000.0
    val got = Eval.rocAuc(rows.toDF("score", "y"), "score", "y")
      .collect()(0).getDouble(2)
    assert(got == want, s"auc $got != brute-force $want")
  }

  private def editRef(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = i
    for (j <- 0 to b.length) dp(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(dp(i - 1)(j - 1) +
        (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    dp(a.length)(b.length)
  }

  test("wer: hand cases and WER semantics") {
    val pairs = Seq(
      (1L, "a b c", "a b c"),     // 0 edits
      (2L, "a x c", "a b c"),     // 1 substitution -> 1/3
      (3L, "a b c d e", "a b"),   // 3 deletions -> wer 1.5 (> 1 ok)
      (4L, "", "a b"),            // empty hyp -> 2 inserts, wer 1
      (5L, "a b", ""))            // empty ref -> wer null
      .toDF("pair_id", "hyp", "ref")
    val out = Eval.wer(pairs, "pair_id", "hyp", "ref")
      .orderBy("pair_id").collect()
    assert(out(0).getLong(3) == 0 && out(0).getDouble(4) == 0.0)
    assert(out(1).getLong(3) == 1 && out(1).getDouble(4) == 0.333333)
    assert(out(2).getLong(3) == 3 && out(2).getDouble(4) == 1.5)
    assert(out(3).getLong(3) == 2 && out(3).getDouble(4) == 1.0)
    assert(out(4).getLong(3) == 2 && out(4).isNullAt(4))
  }

  test("array_edit_distance: randomized vs reference DP and char levenshtein") {
    import org.apache.spark.sql.functions.{levenshtein, regexp_replace, col => c}
    val rnd = new scala.util.Random(71)
    val vocab = Array("a", "b", "c", "d")
    val cases = (0 until 200).map { i =>
      def arr() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      val (x, y) = (arr(), arr())
      (i.toLong, x.mkString(" "), y.mkString(" "), editRef(x, y).toLong)
    }
    val df = cases.map(t => (t._1, t._2, t._3)).toDF("pair_id", "hyp", "ref")
    val got = Eval.wer(df, "pair_id", "hyp", "ref")
      .select("pair_id", "edits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, h, r, want) =>
      assert(got(id) == want, s"edit mismatch on ($h | $r)")
    }
    // single-char tokens: token DP == Spark's builtin char levenshtein
    // on the space-stripped strings
    val lev = df.select(c("pair_id"),
      levenshtein(regexp_replace(c("hyp"), " ", ""),
        regexp_replace(c("ref"), " ", "")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (id, _, _, want) =>
      assert(lev(id).toLong == want, s"levenshtein cross-check on $id")
    }
  }

  test("jackknifeCI: hand-computed grouped jackknife; degenerate bucket") {
    // buckets: b0 = {0.2, 0.4} (sum 600000, n 2), b1 = {0.8} -> N=3,
    // S=1400000; leave-b0-out theta = 800000, leave-b1-out = 300000;
    // mean theta 550000, ss = 2*250000^2; se = sqrt(ss/2) = 250000
    val df = Seq((0L, 0.2), (0L, 0.4), (1L, 0.8)).toDF("b", "v")
    val r = Eval.jackknifeCI(df, "v", "b").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.466667) // floor(1400000/3 + .5)
    assert(r.getDouble(3) == 0.25)
    assert(r.getDouble(4) == -23333.0 / 1000000.0) // 466667 - 490000
    assert(r.getDouble(5) == 956667.0 / 1000000.0)
    // single bucket: se/lo/hi null, mean still defined
    val one = Eval.jackknifeCI(Seq((0L, 0.5), (0L, 0.7)).toDF("b", "v"),
      "v", "b").collect()(0)
    assert(one.getDouble(2) == 0.6 && one.isNullAt(3) && one.isNullAt(4))
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG") {
    import org.apache.spark.sql.functions.{col => c}
    // q1: run [d1, d2, d3]; rels d2:2, d3:1, d9:1 (d9 unretrieved)
    // q2: run [d4, d5]; no relevant docs at all
    val runs = Seq(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L),
      ("q2", 4L, 1L), ("q2", 5L, 2L)).toDF("q", "doc", "rank")
    val qrels = Seq(("q1", 2L, 2), ("q1", 3L, 1), ("q1", 9L, 1),
      ("q2", 4L, 0)).toDF("q", "doc", "rel")
    val out = Eval.retrievalMetrics(runs, qrels, "q", "doc", "rank", "rel",
      k = 3).orderBy("q_id").collect()
    val q1 = out(0)
    assert(q1.getLong(1) == 3 && q1.getLong(2) == 2)
    assert(q1.getDouble(3) == 0.666667)  // 2 of 3 rels retrieved
    assert(q1.getDouble(4) == 0.5)       // first hit at rank 2
    // DCG terms: d2 at r2: 3e6/log2(3)=1892789.26 -> 1892789
    //            d3 at r3: 1e6/2 = 500000  => dcg 2392789
    // ideal: rel 2 at r1 (3e6), rel 1 at r2 (1e6/log2(3)=630929.75 ->
    //   630930), rel 1 at r3 (500000) => idcg 4130930
    assert(q1.getDouble(5) ==
      math.floor(2392789.0 * 1000000.0 / 4130930 + 0.5) / 1000000.0)
    val q2 = out(1)
    assert(q2.getLong(1) == 0 && q2.isNullAt(3) && q2.getDouble(4) == 0.0 &&
      q2.isNullAt(5))
  }

  test("retrievalMetrics: perfect ranking gives nDCG exactly 1") {
    val runs = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("q", "doc", "rank")
    val qrels = Seq(("q", 1L, 3), ("q", 2L, 2), ("q", 3L, 1))
      .toDF("q", "doc", "rel")
    val r = Eval.retrievalMetrics(runs, qrels, "q", "doc", "rank", "rel",
      k = 3).collect()(0)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 &&
      r.getDouble(5) == 1.0)
  }

  test("corpus invariants: every metric scores a self-pair perfect") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("pair_id"), col("text").as("cand"),
        col("text").as("ref"))
    val r2 = Eval.rougeN(d, "pair_id", "cand", "ref", 2)
      .where(col("cand_grams") > 0)
    assert(r2.where(col("rouge_f1") =!= 1.0).count() == 0, "rouge2 self != 1")
    assert(r2.count() > 0)
    val bl = Eval.bleu(d, "pair_id", "cand", "ref")
      .where(col("cand_len") > 0)
    assert(bl.where(col("bleu") =!= 1.0).count() == 0, "bleu self != 1")
    val cf = Eval.chrF(d, "pair_id", "cand", "ref")
      .where(col("cand_chars") > 0)
    assert(cf.where(col("chrf2") =!= 1.0).count() == 0, "chrF self != 1")
    val rl = Eval.rougeL(d, "pair_id", "cand", "ref")
      .where(col("cand_len") > 0)
    assert(rl.where(col("rouge_f1") =!= 1.0 ||
      col("lcs") =!= col("cand_len")).count() == 0, "rougeL self != 1")
  }

  test("corpus invariant: labels ordered by score give AUC exactly 1") {
    import org.apache.spark.sql.functions._
    val scored = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select((col("n_chars").cast("double") / 10000.0).as("score"),
        (col("n_chars") > 500).cast("int").as("y"))
    val r = Eval.rocAuc(scored, "score", "y").collect()(0)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0, "need both classes")
    assert(r.getDouble(2) == 1.0, s"perfectly-ordered AUC = ${r.getDouble(2)}")
  }

  test("compressionRatio: repetition compresses, noise does not") {
    import org.apache.spark.sql.functions.{col => c}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog " * 40), // prose-ish
      (2L, "ab" * 900),                                          // boilerplate
      (3L, (1 to 40).map(i => s"x$i-${i * 7919}").mkString(" ")),// varied
      (4L, ""))                                                  // empty
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis
      .compressionRatio(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val ratios = out.map(r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(ratios(2L).get < 0.05, s"boilerplate ratio ${ratios(2L)}")
    assert(ratios(1L).get < 0.4) // repeated sentence: window sees it
    assert(ratios(3L).get > ratios(2L).get)
    assert(ratios(4L).isEmpty && out(3).getLong(1) == 0)
    // deterministic across evaluations
    val again = graft.pipeline.TextAnalysis
      .compressionRatio(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    assert(again == out.map(_.getLong(2)).toSeq)
  }

  test("unicodeNormalize: composition, reordering, singletons, idempotence") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "cafe\u0301"),      // e + combining acute -> U+00E9
      (2L, "caf\u00e9"),       // already NFC: untouched
      (3L, "o\u0301\u0323"),  // canonical REORDER (ccc 220 < 230) then compose
      (4L, "\u212bngstro\u0308m"), // angstrom singleton -> U+00C5; o+diaeresis -> U+00F6
      (5L, "plain ascii"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis
      .unicodeNormalize(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    def nfc(i: Int) = out(i).getString(4)
    assert(nfc(0) == "caf\u00e9" && out(0).getBoolean(3) &&
      out(0).getLong(1) == 5 && out(0).getLong(2) == 4)
    assert(nfc(1) == "caf\u00e9" && !out(1).getBoolean(3))
    // dot-below (ccc 220) reorders before acute (ccc 230), then o+0323
    // composes to U+1ECD; no fully-precomposed o-dot-acute exists
    assert(nfc(2) == "\u1ecd\u0301" && out(2).getBoolean(3))
    assert(nfc(3) == "\u00c5ngstr\u00f6m" && out(3).getBoolean(3))
    assert(nfc(4) == "plain ascii" && !out(4).getBoolean(3))
    assert(out(5).isNullAt(1) && out(5).isNullAt(3) && out(5).isNullAt(4))
    // idempotence: NFC of the normalized column is a fixed point
    val again = graft.pipeline.TextAnalysis.unicodeNormalize(
      graft.pipeline.TextAnalysis.unicodeNormalize(docs, "text", "doc_id")
        .select(col("doc_id"), col("text_nfc")),
      "text_nfc", "doc_id").orderBy("doc_id").collect()
    assert(again.forall(r => r.isNullAt(3) || !r.getBoolean(3)))
    assert(again.map(r => if (r.isNullAt(4)) null else r.getString(4)).toSeq ==
      out.map(r => if (r.isNullAt(4)) null else r.getString(4)).toSeq)
  }

  test("mbrSelect: central candidate wins, ties break on id, k=1 trivial") {
    val cands = Seq(
      (1L, 10L, "a b c d"),    // near-identical pair
      (1L, 11L, "a b c d e"),
      (1L, 12L, "x y z w"),    // outlier: shares nothing
      (2L, 20L, "only sample"),// k=1 problem
      (3L, 30L, "p q r"),
      (3L, 31L, ""))           // empty candidate: sim 0 both ways
      .toDF("problem", "cand_id", "text")
    val out = Eval.mbrSelect(cands, "problem", "cand_id", "text", n = 2)
      .orderBy("problem").collect()
    // pairwise f1(10,11): m=3, p=1, r=750000 -> 857143; f1 to outlier 0;
    // mean = floor(857143/2 + .5) = 428572; 10 and 11 tie -> id asc
    assert(out(0).getLong(1) == 10L)
    assert(out(0).getDouble(2) == 0.428572 && out(0).getLong(3) == 3)
    assert(out(1).getLong(1) == 20L && out(1).isNullAt(2) &&
      out(1).getLong(3) == 1)
    // empty candidate scores 0 against its sibling; sibling also 0
    // (nothing shared) -> id asc picks 30
    assert(out(2).getLong(1) == 30L && out(2).getDouble(2) == 0.0)
  }

  private def lcsRef(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("rougeL: hand cases and metric wiring") {
    val pairs = Seq(
      (1L, "a b c d", "a x b y d"), // lcs = 3 (a b d)
      (2L, "w w w", "w w"),         // lcs = 2: duplicates count
      (3L, "", "a b"))              // empty cand -> null P/F1
      .toDF("pair_id", "cand", "ref")
    val out = Eval.rougeL(pairs, "pair_id", "cand", "ref")
      .orderBy("pair_id").collect()
    assert(out(0).getLong(3) == 3)
    assert(out(0).getDouble(4) == 0.75 && out(0).getDouble(5) == 0.6)
    assert(out(1).getLong(3) == 2 && out(1).getDouble(5) == 1.0)
    assert(out(2).isNullAt(4) && out(2).isNullAt(6))
  }

  test("rougeL: randomized agreement with a reference DP (codegen path)") {
    val rnd = new scala.util.Random(61)
    val vocab = Array("a", "b", "c", "d", "e")
    val cases = (0 until 200).map { i =>
      def arr() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
      val (c, r) = (arr(), arr())
      (i.toLong, c.mkString(" "), r.mkString(" "), lcsRef(c, r).toLong)
    }
    val df = cases.map(t => (t._1, t._2, t._3)).toDF("pair_id", "cand", "ref")
    val got = Eval.rougeL(df, "pair_id", "cand", "ref")
      .select("pair_id", "lcs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (id, c, r, want) =>
      assert(got(id) == want, s"lcs mismatch on ($c | $r)")
    }
  }

  test("LcsLength: interpreted eval path matches codegen semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def lit(xs: Seq[String]) = Literal.create(xs, ArrayType(StringType))
    val e = graft.functions.LcsLength(
      lit(Seq("a", "b", "c", "d")), lit(Seq("a", "x", "b", "y", "d")))
    assert(e.eval(InternalRow.empty) == 3)
    val rnd = new scala.util.Random(62)
    val vocab = Array("a", "b", "c")
    (0 until 100).foreach { _ =>
      def arr() = Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length)))
      val (c, r) = (arr(), arr())
      assert(graft.functions.LcsLength(lit(c), lit(r)).eval(InternalRow.empty)
        == lcsRef(c, r), s"interpreted lcs mismatch on ($c | $r)")
    }
  }

  test("spearman: exact tie-aware rho; constant signal yields null, not NaN") {
    // g1: perfect monotone pair -> rho = 1; g2: perfect inverse -> -1;
    // g3: y constant -> variance 0 -> null
    val df = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L),
      ("g2", 1L, 30L), ("g2", 2L, 20L), ("g2", 3L, 10L),
      ("g3", 1L, 5L), ("g3", 2L, 5L), ("g3", 3L, 5L)
    ).toDF("g", "x", "y")
    val out = graft.pipeline.Eval.spearman(df, "x", "y", "g")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("g1") === Some(1.0))
    assert(out("g2") === Some(-1.0))
    assert(out("g3") === None)
  }
}
