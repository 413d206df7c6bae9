package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.functions.RollingHash

/** Training-data pipeline operators: dedup family, ANN, text analysis,
  * multimodal plumbing. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),     // near dup of 0
    (3L, "completely different content about spark engines and joins"),
    (4L, "The Quick, Brown Fox jumps over the lazy dog!"))   // exact after normalize
    .toDF("doc_id", "text")

  test("exact dedup: fingerprint groups with canonical id") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 3) // {0,1,4}, {2}, {3}
    val big = groups.find(_.getLong(1) == 3L).get
    assert(big.getLong(2) == 0L) // canonical = min id
    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L))
  }

  test("minhash LSH finds the planted near-duplicate pair") {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup always survives
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc clean
  }

  test("incremental minhash: new batch dedupes against the signature store") {
    // corpus batch -> staged signature store; new batch computes signatures
    // for ITS docs only and finds cross-batch near-dups via the bucket join
    val corpus = docs.where(col("doc_id") <= 2)
    val (storeShingles, storeBuckets) = Dedup.minhashStages(
      corpus, "text", "doc_id", shingleWords = 2, numHashes = 32, bands = 16)
    val newBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),  // dup of store 0/1
      (11L, "entirely novel text that matches nothing at all"))
      .toDF("doc_id", "text")
    val hits = Dedup.minhashNearDupsAgainstStore(newBatch, "text", "doc_id",
      storeShingles, storeBuckets,
      shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((10L, 0L)) && hits.contains((10L, 1L)))
    assert(!hits.exists(_._1 == 11L))
  }

  test("incremental simhash: new batch against the staged fingerprint store") {
    val corpus = docs.where(col("doc_id") <= 2)
    val (storeSims, storeBuckets) = Dedup.simhashStages(corpus, "text", "doc_id")
    val newBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "entirely novel text that matches nothing at all"))
      .toDF("doc_id", "text")
    val hits = Dedup.simhashNearDupsAgainstStore(newBatch, "text", "doc_id",
      storeSims, storeBuckets, maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((10L, 0L)) && hits.contains((10L, 1L)))
    assert(!hits.exists(_._1 == 11L))
  }

  test("streaming exact dedup drops redeliveries within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (1L, "doc one text", ts("2024-01-01 00:00:00")),
      (2L, "doc one text", ts("2024-01-01 00:00:05")),   // redelivery
      (3L, "doc two text", ts("2024-01-01 00:00:10")))
    val deduped = Dedup.streamingDropExactDuplicates(
      input.toDF().toDF("doc_id", "text", "event_ts"),
      "text", "event_ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "streaming dedup did not finish")
      val texts = spark.sql("SELECT text FROM dedup_out")
        .collect().map(_.getString(0)).sorted
      assert(texts.toSeq == Seq("doc one text", "doc two text"))
    } finally q.stop()
  }

  test("streaming ingestion gate: foreachBatch near-dup vs a growing staged store") {
    // the 100 TB operating mode end-to-end: each arriving micro-batch is
    // checked against the parquet-staged signature store, only novel docs
    // append to the corpus, and THEIR signatures extend the store — so a
    // near-dup arriving in a LATER batch is caught without re-shingling
    // any corpus text
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val (shRoot, bkRoot, corpusRoot) =
      (s"$root/shingles", s"$root/buckets", s"$root/corpus")
    // seed the store from an initial corpus batch
    val seed = docs.where(col("doc_id") <= 3)
    val (sh0, bk0) = Dedup.minhashStages(seed, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 16)
    sh0.write.parquet(shRoot); bk0.write.parquet(bkRoot)
    seed.write.parquet(corpusRoot)

    val input = MemoryStream[(Long, String)]
    // one checkpointed AvailableNow run per arriving batch (MemoryStream
    // folds all pending data into one micro-batch otherwise; the shared
    // checkpoint makes run 2 resume past run 1's offsets)
    def runGate(): Unit = {
      val q = input.toDF().toDF("doc_id", "text").writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // tier 1: intra-batch near-dups (the store only knows PAST
          // batches) — keep each within-batch pair's smaller id
          val intra = Dedup.minhashNearDups(batch, "text", "doc_id",
            shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.5)
          val batchCanon = batch.join(
            intra.select(col("id_b").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          // tier 2: survivors vs the staged signature store
          val hits = Dedup.minhashNearDupsAgainstStore(batchCanon, "text", "doc_id",
            spark.read.parquet(shRoot), spark.read.parquet(bkRoot),
            shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.5)
          // novel drives 3 actions (corpus append + 2 store appends):
          // persist so the gate joins execute once, not three times
          val novel = batchCanon.join(
            hits.select(col("id_new").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti").persist()
          novel.write.mode("append").parquet(corpusRoot)
          val (shN, bkN) = Dedup.minhashStages(novel, "text", "doc_id",
            shingleWords = 2, numHashes = 32, bands = 16)
          shN.write.mode("append").parquet(shRoot)
          bkN.write.mode("append").parquet(bkRoot)
          // release this batch's gate caches (novel + the dedup-internal
          // signature stages) — a long-running gate must not accumulate
          spark.catalog.clearCache()
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(180000), "ingestion gate did not finish")
      finally q.stop()
    }
    input.addData(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of seed 0/1
      (11L, "genuinely novel content in the first batch"),
      (14L, "genuinely novel content in the first batch"))  // intra-batch dup of 11
    runGate()
    input.addData(
      (12L, "genuinely novel content in the first batch"),  // dup of 11 (cross-batch)
      (13L, "another novel document arriving later"))
    runGate()
    val corpus = spark.read.parquet(corpusRoot)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 10 (dup of seed), 14 (intra-batch dup of 11), and 12 (dup of
    // batch-1's 11, via the GROWN store) are gated out; 11 and 13 land
    assert(corpus == Seq(0L, 1L, 2L, 3L, 11L, 13L))
  }

  test("streaming ANN index maintenance: batch-N vectors searchable at batch N+1") {
    // the serving-side analogue of the ingestion gate: each arriving
    // micro-batch of embeddings is first SEARCHED against the staged
    // IVF-PQ index, then its own (id, list, codes) rows append to the
    // store — so a vector that arrived at batch N is a candidate for
    // batch N+1's queries without ever re-reading float vectors of the
    // existing corpus
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    val (idxRoot, hitsRoot) = (s"$root/index", s"$root/hits")
    // dim 8; two coarse lists; PQ = 2 subspaces of 4 dims, 2 codes each
    val cents = Seq(
      (0, Seq(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)),
      (1, Seq(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("group", "cv")
      .select(col("group"), posexplode(col("cv")).as(Seq("pos", "centroid")))
    val cb = Seq(
      (0, 0, Seq(1.0, 1.0, 1.0, 1.0)), (0, 1, Seq(0.0, 0.0, 0.0, 0.0)),
      (1, 0, Seq(0.0, 0.0, 0.0, 0.0)), (1, 1, Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("sub", "code", "centroid")
    val seed = Seq(
      (0L, Seq(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0)))
      .toDF("vec_id", "embedding")
    Similarity.ivfPqIndex(seed, cents, cb).write.parquet(idxRoot)

    val input = MemoryStream[(Long, Seq[Double])]
    def runBatch(): Unit = {
      val q = input.toDF().toDF("vec_id", "embedding").writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val queries = batch.select(col("vec_id").as("q_id"),
            col("embedding").as("q_vec")).persist()
          Similarity.ivfPqTopKAgainstStore(
            spark.read.parquet(idxRoot), queries, cents, cb, k = 2, nProbe = 1)
            .write.mode("append").parquet(hitsRoot)
          Similarity.ivfPqIndex(batch, cents, cb)
            .write.mode("append").parquet(idxRoot)
          spark.catalog.clearCache()
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(180000), "index maintenance did not finish")
      finally q.stop()
    }
    input.addData((10L, Seq(0.9, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)))
    runBatch()
    input.addData((20L, Seq(0.95, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0)))
    runBatch()
    val hits = spark.read.parquet(hitsRoot)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // batch 1's query sees only the seed; batch 2's query sees the seed
    // AND batch 1's vector — the store grew
    assert(hits.contains((10L, 0L)))
    assert(hits.contains((20L, 0L)) && hits.contains((20L, 10L)),
      s"batch-2 query missed the batch-1 arrival: $hits")
  }

  test("simhash near-dups by hamming distance") {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical text -> distance 0
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash bucket-skew cap bounds a viral duplicate cluster") {
    // 1000 identical docs share every band bucket: uncapped pairing would
    // emit k²/2 ≈ 500k candidates; the star cap keeps it linear while still
    // linking every member (transitively, via the bucket head) for dedup
    val viral = (0L until 1000L).map(i => (i, "same viral text repeated everywhere"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(viral, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5,
      maxBucketPairing = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length < 5000, s"cap failed: ${pairs.length} candidate pairs")
    val covered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(covered == (0L until 1000L).toSet) // every member reachable
    // only head-star pairs (x = bucket head) or pairs inside the cap window
    assert(pairs.forall(p => p._1 == 0L || p._2 <= 15L))
  }

  test("url canonicalization: all rules fire; garbage passes through") {
    def canon(s: String): String = Seq(s).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u"))).collect()(0).getString(0)
    assert(canon("HTTPS://WWW.Ex.COM:443/A/?b=2&utm_x=1&a=1#f") ==
      "https://ex.com/A?a=1&b=2")
    assert(canon("http://ex.com:8080/") == "http://ex.com:8080/")
    assert(canon("http://ex.com:80/x/y/") == "http://ex.com/x/y")
    assert(canon("https://ex.com") == "https://ex.com")
    assert(canon("ftp://Ex.com:443/z") == "ftp://ex.com:443/z") // not https's port
    assert(canon("plain words") == "plain words")
    // canonical forms COLLIDE where they should: dedup-key property
    assert(canon("http://WWW.a.com/p?x=1&y=2") == canon("http://a.com:80/p/?y=2&x=1&gclid=g"))
  }

  test("randomized invariants: containment dominates jaccard; coverage is monotone; decon threshold is monotone") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    // C(A->B) >= J(A,B) for every pair (|A| <= |A∪B|), equality iff A ⊆ B
    val textGen = for {
      n <- Gen.choose(1, 10)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield ws.mkString(" ")
    val pairs = (1 to 25).map(i => (
      textGen.pureApply(params, Seed(i.toLong)),
      textGen.pureApply(params, Seed(1000L + i))))
    val rows = pairs.toDF("ta", "tb").select(
      Dedup.containment(Dedup.wordShingles(col("ta"), 2),
        Dedup.wordShingles(col("tb"), 2)).as("c"),
      Dedup.jaccard(Dedup.wordShingles(col("ta"), 2),
        Dedup.wordShingles(col("tb"), 2)).as("j")).collect()
    rows.foreach(r => assert(r.getDouble(0) >= r.getDouble(1) - 1e-12,
      s"containment must dominate jaccard: $r"))
    // vocabCoverage is monotone non-decreasing in N and capped at 1
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cov = TextAnalysis.vocabCoverage(docs, "text", Seq(5, 50, 500, 5000))
      .orderBy("n_vocab").collect().map(_.getDouble(3))
    assert(cov.sameElements(cov.sorted) && cov.last <= 1.0,
      s"coverage must be monotone: ${cov.toSeq}")
    // semanticDecontaminate: raising the threshold can only ADD keeps
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = e.where(col("vec_id") < 5).select(col("embedding"))
    def keeps(th: Double) = Dedup.semanticDecontaminate(e, bench, "vec_id",
        "embedding", "embedding", th)
      .where(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet
    val strict = keeps(0.3)
    val loose = keeps(0.9)
    assert(strict.subsetOf(loose),
      s"threshold monotonicity violated: ${strict.size} !<= ${loose.size}")
  }

  test("url canonicalization is idempotent over randomized urls") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Ex.com", "a.b.ORG", "x.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/p.html")
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_s=1", "?z=1&utm_x=2&y=3&gclid=g")
      frag <- Gen.oneOf("", "#f", "#x/y?z")
    } yield s"$scheme://$www$host$port$path$q$frag"
    val params = Gen.Parameters.default
    val urls = (1 to 60).map(i => urlGen.pureApply(params, Seed(i.toLong))) :+
      "not a url" :+ ""
    val once = urls.toDF("u")
      .select(col("u"), TextAnalysis.canonicalizeUrl(col("u")).as("c1"))
    val twice = once.select(col("u"), col("c1"),
        TextAnalysis.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    twice.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not idempotent: ${r.getString(0)} -> ${r.getString(1)} -> ${r.getString(2)}")
    }
  }

  test("char entropy: repetitive filler scores low, varied text high, empty is 0") {
    val docsIn = Seq(
      (1L, "aaaaaaaaaaaaaaaa"),       // one class -> entropy 0
      (2L, "abcdefghijklmnop"),       // 16 uniform classes -> ln 16
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docsIn, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(1L) == ((16L, 1L, 0.0)), s"constant text: ${out(1L)}")
    assert(out(2L)._1 == 16L && out(2L)._2 == 16L &&
      math.abs(out(2L)._3 - math.log(16.0)) < 1e-5, s"uniform: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0.0)), s"empty doc must not vanish: ${out(3L)}")
    // partitioning invariance of the integer-term sum
    val rep = TextAnalysis.charEntropy(docsIn.repartition(7), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rep == out.view.mapValues(_._3).toMap)
  }

  test("containment is asymmetric: a quoted fragment scores 1 toward its host") {
    val sa = Dedup.wordShingles(lit("alpha beta gamma"), 2)
    val sb = Dedup.wordShingles(lit("intro words alpha beta gamma outro end"), 2)
    val r = spark.range(1).select(
      Dedup.containment(sa, sb).as("cab"),
      Dedup.containment(sb, sa).as("cba"),
      Dedup.jaccard(sa, sb).as("j")).collect()(0)
    assert(r.getDouble(0) == 1.0, s"fragment->host must be 1.0: $r")
    assert(r.getDouble(1) < 0.5 && r.getDouble(2) < 0.5,
      s"host->fragment and jaccard must stay fractional: $r")
    // empty-side guard
    val e = spark.range(1).select(Dedup.containment(
      array().cast("array<string>"), sb)).collect()(0).getDouble(0)
    assert(e == 0.0)
  }

  test("ngram jaccard on adjacent pairs") {
    val paired = docs.as("a").join(docs.as("b"),
      col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("id"), col("a.text").as("ta"), col("b.text").as("tb"))
    val j = paired.withColumn("j", Dedup.ngramJaccardPairs(paired, "ta", "tb"))
      .select("id", "j").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(j(0L) == 1.0)          // identical
    assert(j(1L) > 0.5 && j(1L) < 1.0) // near dup
    assert(j(2L) < 0.2)           // unrelated
  }

  test("embedding near-dups via hyperplane LSH + exact cosine verify") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.2f, 0.1f)),
      (1L, Array(0.99f, 0.01f, 0.2f, 0.1f)),  // near dup of 0
      (2L, Array(-1.0f, 0.5f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, -0.5f, 0.3f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, "embedding", "vec_id",
      planes = 8, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("incremental embedding near-dup against the staged signature store") {
    val store = Dedup.embeddingStages(Seq(
      (0L, Array(1.0f, 0.0f, 0.2f, 0.1f)),
      (2L, Array(-1.0f, 0.5f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding"), "embedding", "vec_id", planes = 8)
    val newBatch = Seq(
      (10L, Array(0.99f, 0.01f, 0.2f, 0.1f)),  // near dup of store 0
      (11L, Array(0.0f, 0.0f, -1.0f, 0.9f)))   // unrelated
      .toDF("vec_id", "embedding")
    val hits = Dedup.embeddingNearDupsAgainstStore(newBatch, "embedding",
      "vec_id", store, planes = 8, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((10L, 0L)))
  }

  test("brute-force ANN top-k matches hand-computed ranking") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val top = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(top == Seq(0L, 1L))
  }

  test("LSH ANN recalls the exact top-1 for clustered vectors") {
    val corpus = (0 until 50).map(i =>
      (i.toLong, Array(math.cos(i / 8.0).toFloat, math.sin(i / 8.0).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = Seq((999L, Array(math.cos(3 / 8.0).toFloat, math.sin(3 / 8.0).toFloat)))
      .toDF("q_id", "q_vec")
    val got = Similarity.lshTopK(corpus, queries, k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(got.length == 1 && got(0) == 3L) // its own twin vector
  }

  test("IVF and LSH ANN recall vs brute force on the sf0.001 embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Similarity.bruteForceTopK(e, queries, k = 3))
    val ivf = topSet(Similarity.ivfTopK(e, queries, k = 3, nLists = 8, nProbe = 4))
    val lsh = topSet(Similarity.lshTopK(e, queries, k = 3))
    // probing half the lists must recover most of the exact neighborhood —
    // a floor, not an exact match (approximate); the banded AND-OR LSH
    // (r12 graduation) holds a much higher floor than the single-signature
    // scheme it replaced (which measured 1/3 here)
    assert(ivf.intersect(exact).size >= exact.size / 2,
      s"IVF recall ${ivf.intersect(exact).size}/${exact.size}")
    assert(lsh.intersect(exact).size >= (exact.size * 3) / 4,
      s"LSH recall ${lsh.intersect(exact).size}/${exact.size}")
  }

  test("text analysis: tokens, quality, langid, fingerprints") {
    val r = Seq("The quick brown fox, jumps!").toDF("text").select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe"),
      TextAnalysis.punctRatio(col("text")).as("punct"),
      TextAnalysis.qualityScore(col("text"), Seq("the", "a", "of")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()(0)
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 7) // 5 words + comma + bang
    assert(r.getDouble(2) > 0 && r.getDouble(2) < 0.2)
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    assert(r.getString(4).length == 32)
    val lang = Seq("el perro que corre").toDF("text").select(
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "dog", "that"),
        "es" -> Seq("el", "perro", "que")))).collect()(0).getString(0)
    assert(lang == "es")
  }

  test("rolling hash expression: codegen path, determinism, distribution") {
    val hashes = docs.select(RollingHash.rolling_hash(col("text")).as("h"))
      .as[Long].collect()
    assert(hashes(0) == hashes(1)) // identical text
    assert(hashes.toSet.size == 4) // raw-text hash: {0,1} collide; 2,3,4 distinct
    assert(hashes.forall(h => h >= 0 && h < (1L << 61) - 1))
    // matches the reference Scala implementation exactly
    val expected = RollingHash.hash(
      "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    assert(hashes(0) == expected)
  }

  test("multimodal: media table schema, stub features, frame sampling") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text", "image")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "bytes", "meta"))
    val feats = media.select(col("media_id"),
      Multimodal.stubDecodeFeatures(col("bytes"), 8).as("f"))
    val row = feats.where(col("media_id") === 0).collect()(0)
    assert(row.getSeq[Double](1).size == 8)
    assert(row.getSeq[Double](1).forall(v => v >= 0.0 && v < 1.0))
    // identical bytes -> identical features
    val f01 = feats.where(col("media_id").isin(0, 1))
      .collect().map(_.getSeq[Double](1))
    assert(f01(0) == f01(1))
    val frames = Multimodal.stubFrameSample(media, 4)
    assert(frames.count() == 5 * 4)
    assert(frames.schema.fieldNames.contains("byte_offset"))
    // mapPartitions decode loop produces the same features per id
    val decoded = Multimodal.decodePartitioned(media, 8)
    assert(decoded.count() == 5)
  }

  test("connected components: chain, star, and disjoint clusters converge") {
    // chain 1-2-3-4-5 (diameter 4 forces multiple propagation rounds),
    // star 10-{11,12}, isolated edge 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L),
      (10L, 11L), (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
    assert(labels.size == 10)
  }

  test("connected components: a 200-node chain converges via pointer jumping") {
    // one-hop propagation alone would need 199 rounds; the Shiloach-Vishkin
    // shortcut must close a diameter-199 component within maxIter
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 1L), "every chain member must label to the min id")
  }

  test("exact-dup clustering labels every duplicate with the group minimum") {
    val labels = Dedup.exactDupClusters(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 4L -> 0L)) // {0,1,4} normalize equal
  }

  test("pii redaction scrubs emails, ipv4, and long digit runs with counts") {
    val df = Seq(
      "mail a@b.co and c.d-e@f.org, host 10.1.2.3, order 123456789, ok 123")
      .toDF("text")
    val cols = TextAnalysis.piiRedact(col("text")).as("red") +:
      TextAnalysis.piiCounts(col("text")).map { case (t, c) => c.as(t) }
    val out = df.select(cols: _*).collect()(0)
    assert(out.getString(0) ==
      "mail <EMAIL> and <EMAIL>, host <IPV4>, order <NUMID>, ok 123")
    assert(out.getInt(1) == 2 && out.getInt(2) == 1 && out.getInt(3) == 1)
  }

  test("hash sampling is deterministic, subset-monotone, and near the rate") {
    val ids = spark.range(0, 4000).toDF("id")
    val kept20 = ids.where(TextAnalysis.hashSampleKeep(col("id"), 0.2))
      .as[Long].collect().toSet
    val kept50 = ids.where(TextAnalysis.hashSampleKeep(col("id"), 0.5))
      .as[Long].collect().toSet
    assert(kept20.subsetOf(kept50)) // raising the rate only adds rows
    assert(math.abs(kept20.size / 4000.0 - 0.2) < 0.03)
    assert(ids.where(TextAnalysis.hashSampleKeep(col("id"), 1.0)).count() == 4000)
    assert(ids.where(TextAnalysis.hashSampleKeep(col("id"), 0.0)).count() == 0)
    // re-evaluation returns the identical set (no RNG state)
    val again = ids.where(TextAnalysis.hashSampleKeep(col("id"), 0.2))
      .as[Long].collect().toSet
    assert(again == kept20)
    val strat = TextAnalysis.stratifiedHashSample(
      ids.withColumn("s", when(col("id") % 2 === 0, "a").otherwise("b")),
      "id", "s", Map("a" -> 1.0)) // keep all of stratum a, drop b entirely
    assert(strat.where(col("s") === "b").count() == 0)
    assert(strat.count() == 2000)
  }

  test("repetition fraction flags repeated bigrams, 0 for short/unique text") {
    val out = Seq(
      (0L, "spam spam spam spam"),       // bigrams: 3x "spam spam" -> 2/3
      (1L, "all words are unique here"), // 0.0
      (2L, "one"),                       // too short -> 0.0
      (3L, ""))                          // empty -> 0.0
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.repetitionFraction(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(0L) - 0.666667) < 1e-6)
    assert(out(1L) == 0.0 && out(2L) == 0.0 && out(3L) == 0.0)
  }

  test("approx distinct (HLL sketch) lands within the error bound of exact") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val approx = Queries.registry("q16_approx_distinct")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact)
      assert(math.abs(approx(k) - e) <= math.max(3, e * 0.06),
        s"$k: approx ${approx(k)} vs exact $e outside 3x rsd bound")
  }

  test("dropNearDuplicates keeps one doc per near-dup cluster") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // dup of 0
      (2L, "completely different content about spark engines and joins"),
      (3L, "unrelated third text mentioning shuffles and catalyst rules"))
      .toDF("doc_id", "text")
    val out = Dedup.dropNearDuplicates(corpus, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(0L) == (0L, true))   // cluster canonical
    assert(out(1L) == (0L, false))  // dropped into 0's cluster
    assert(out(2L) == (2L, true) && out(3L) == (3L, true)) // singletons kept
  }

  test("under-planed LSH warns loudly instead of silently losing recall") {
    // planes must scale ~log2(corpus/cap); a fixed width that is fine at
    // sf0.1 saturates at 100x. recommendedPlanes is the sizing rule and
    // warnIfUnderPlaned is the guard every LSH entry point runs.
    assert(Dedup.recommendedPlanes(64, 64) == 4)          // clamp floor
    assert(Dedup.recommendedPlanes(1L << 20, 64) == 14)   // 2^14 buckets
    assert(Dedup.recommendedPlanes(Long.MaxValue, 1) == 62) // clamp ceiling
    assert(Dedup.warnIfUnderPlaned("t", 1000, 2, 64))     // 250/bucket > 64
    assert(!Dedup.warnIfUnderPlaned("t", 1000, 6, 64))    // ~16/bucket ok
    // pigeonhole (simhash/phash) guard: fixed 2^16 buckets
    assert(Dedup.warnIfUnderBucketed("t", 65536L * 65, 64))  // 65/bucket
    assert(!Dedup.warnIfUnderBucketed("t", 65536L * 63, 64)) // 63/bucket
    // the guard fires through the public operator on an under-planed corpus
    val vecs = spark.range(200).select(col("id"),
      array(rand(7), rand(8), rand(9), rand(10)).as("embedding"))
    val err = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(err, true))
    try Dedup.embeddingNearDups(vecs, "embedding", "id",
      planes = 1, threshold = 0.999)
    finally System.setErr(old)
    assert(err.toString.contains("exceeds the pairing cap"),
      s"expected occupancy warning on planes=1, got: ${err.toString.take(200)}")
  }

  test("array-valued results round-trip parquet (native q17 path)") {
    // The driver's oracle hashes q17's string projection (pandas cannot
    // sort list cells); this pins the NATIVE array<string> surface: the
    // aggregation produces real list columns that survive a parquet
    // round-trip bit-identically and agree with the string projection.
    val dir = "/root/testdata/sf0.001"
    val native = Queries.q17Native(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("q17native").toString
    native.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("event_types").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false) ||
      back.schema("event_types").dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType])
    val a = native.orderBy("user_id").collect()
    val b = back.orderBy("user_id").collect()
    assert(a.sameElements(b))
    // joined-string projection (what the driver hashes) agrees with the list
    val joined = back.select(col("user_id"),
      array_join(col("event_types"), ",").as("s")).orderBy("user_id")
      .collect().map(r => r.get(0) -> r.getString(1))
    val fromList = a.map(r =>
      r.get(r.fieldIndex("user_id")) ->
        r.getSeq[String](r.fieldIndex("event_types")).mkString(","))
    assert(joined.sameElements(fromList))
  }

  test("url extraction captures full urls; domain counts aggregate hosts") {
    val df = Seq(
      "see https://a.example.com/x/y and http://b.org plain text",
      "again https://a.example.com/z").toDF("t")
    val urls = df.select(TextAnalysis.extractUrls(col("t")).as("u"))
      .collect().map(_.getSeq[String](0))
    assert(urls(0) == Seq("https://a.example.com/x/y", "http://b.org"))
    assert(urls(1) == Seq("https://a.example.com/z"))
    val domains = TextAnalysis.domainCounts(df, "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(domains == Map("a.example.com" -> 2L, "b.org" -> 1L))
  }

  test("vocabulary top-k counts tokens with deterministic tie order") {
    val vocab = TextAnalysis.vocabularyTopK(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "the" appears 2x in docs 0,1,2,4 => 8; ties broken by token asc
    assert(vocab(0) == ("the", 8L))
    assert(vocab.length == 3)
    assert(vocab.sortBy(t => (-t._2, t._1)).toSeq == vocab.toSeq)
  }

  test("decontamination counts benchmark snippets contained in documents") {
    val snips = Seq("quick brown fox", "spark engines").toDF("snip")
    val hits = TextAnalysis.contaminatedDocs(docs, "text", "doc_id", snips, "snip")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L)) // doc 4 punctuated
  }

  test("ngram contamination: token-exact n-gram collisions, case-folded") {
    val snips = Seq("The QUICK brown fox jumps").toDF("snip") // 5 tokens, 1 gram
    val hits = TextAnalysis.ngramContamination(docs, "text", "doc_id",
      snips, "snip", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0/1/2 contain "the quick brown fox jumps"; doc 4's comma breaks
    // the token ("quick," != "quick"); doc 3 shares nothing
    assert(hits == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("surgical decontamination cuts matching spans, keeps the rest, never drops docs") {
    val docsIn = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // quotes the bench opening
      (2L, "totally unrelated words here live now"),
      (3L, "alpha beta gamma delta epsilon")) // the whole doc IS the snippet
      .toDF("doc_id", "text")
    val snips = Seq("alpha beta gamma delta epsilon").toDF("snip")
    val out = TextAnalysis.removeContaminatedSpans(docsIn, "text", "doc_id",
        snips, "snip", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(1L) == (("zeta eta", 7L, 5L)), s"span cut: ${out(1L)}")
    assert(out(2L) == (("totally unrelated words here live now", 6L, 0L)))
    // fully contaminated: comes back EMPTY, not absent
    assert(out(3L) == (("", 5L, 5L)), s"full removal: ${out(3L)}")
    assert(out.size == 3)
  }

  test("semantic decontamination: benchmark-aligned vectors drop, orthogonal keep") {
    // train ids 1 (copy of bench), 2 (near-copy), 3 (orthogonal)
    val train = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.05f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val bench = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("embedding")
    val out = Dedup.semanticDecontaminate(train, bench, "vec_id",
        "embedding", "embedding", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) == ((1.0, false)), s"exact copy must drop: $out")
    assert(out(2L)._1 > 0.95 && !out(2L)._2, s"paraphrase-close must drop: $out")
    assert(out(3L) == ((0.0, true)), s"orthogonal must keep: $out")
  }

  test("span dedup: keep-first across the corpus, survivors reassemble in order") {
    val spanDocs = Seq(
      (0L, "a b c d e f g h i j"),   // spans: [a..h], [i j]
      (1L, "a b c d e f g h x y"),   // first span duplicates doc 0's -> dropped
      (2L, "a b c d e f g h"))       // entirely doc 0's first span -> doc vanishes
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(spanDocs, "text", "doc_id", spanWords = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(0L) == (2L, "a b c d e f g h i j"))
    assert(out(1L) == (1L, "x y"))
    assert(!out.contains(2L), "a doc made entirely of repeated spans must vanish")
    // invariant: surviving text is a subsequence of the original tokens
    assert(out(1L)._2.split(" ").forall(Set("x", "y")))
  }

  test("semantic decontamination: empty benchmark keeps every training row") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val bench = Seq.empty[Tuple1[Array[Float]]].toDF("embedding")
    val out = Dedup.semanticDecontaminate(train, bench, "vec_id",
        "embedding", "embedding", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getBoolean(2)))
      .toMap
    assert(out.size == 2, s"every training row must appear: $out")
    assert(out(1L) == ((true, true)) && out(2L) == ((true, true)),
      s"no bench row -> null max_bench_cos, keep=true: $out")
  }

  test("repeated substrings: shared block found at ANY offset, boundaries exact") {
    // the case spanDedup's fixed chunk grid misses: the same 5-token block
    // at offset 2 in doc 0 and offset 1 in doc 1 (minLen=4)
    val rsDocs = Seq(
      (0L, "u00 u01 w1 w2 w3 w4 w5 u02 u03"),
      (1L, "v0 w1 w2 w3 w4 w5 v1 v2 v3"),
      (2L, "x0 x1 x2 x3 x4 x5 x6 x7"))
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSubstringSpans(rsDocs, "text", "doc_id", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.getString(4))))
      .toMap
    // run extension: starts {2,3} union to the single maximal span [2,6]
    assert(out(0L) == ((9L, 1L, 5L, Some("2:6"))), s"doc 0: ${out(0L)}")
    assert(out(1L) == ((9L, 1L, 5L, Some("1:5"))), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((8L, 0L, 0L, None)), s"clean doc: ${out(2L)}")
  }

  test("repeated substrings: intra-doc repeats flag both occurrences; gaps split spans") {
    val rsDocs = Seq(
      (3L, "r1 r2 r3 r4 z1 r1 r2 r3 r4"),       // same 4-gram twice in ONE doc
      (4L, "s1 s2 s3 s4 s5 s6 s7 s8"),           // covered starts {0,4}: touching
      (5L, "s1 s2 s3 s4 q1 s5 s6 s7 s8"),        // doc 4's halves, split by q1
      (6L, ""))                                   // empty doc never vanishes
      .toDF("doc_id", "text")
    val out = Dedup.repeatedSubstringSpans(rsDocs, "text", "doc_id", minLen = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.getString(4))))
      .toMap
    assert(out(3L) == ((9L, 2L, 8L, Some("0:3;5:8"))), s"intra-doc: ${out(3L)}")
    // [0,3] and [4,7] touch -> ONE contiguous flagged region
    assert(out(4L) == ((8L, 1L, 8L, Some("0:7"))), s"touching merge: ${out(4L)}")
    assert(out(5L) == ((9L, 2L, 8L, Some("0:3;5:8"))), s"gap splits: ${out(5L)}")
    assert(out(6L) == ((0L, 0L, 0L, None)), s"empty doc: ${out(6L)}")
  }

  test("substring store step: repeats flag the arriving batch; retried batches overwrite, never double-count") {
    val store = java.nio.file.Files.createTempDirectory("d21spec").toString
    // doc 0: an 8-token block + 2 unique tokens (3 grams at minLen=8)
    val b0 = Seq((0L, "a1 a2 a3 a4 a5 a6 a7 a8 x1 x2")).toDF("doc_id", "text")
    // doc 10 repeats doc 0's block at offset 1
    val b1 = Seq((10L, "y1 a1 a2 a3 a4 a5 a6 a7 a8 y2")).toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      Dedup.repeatedSubstringStoreStep(b, store, "text", "doc_id",
        minLen = 8, batchId = id)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), Option(r.getString(4)))).toMap
    // batch 0: store empty, block unique so far -> clean
    assert(run(b0, 0L)(0L) == ((0L, None)), "first batch must see no repeats")
    // batch 1: block now repeated across batches -> arriving doc flagged
    assert(run(b1, 1L)(10L) == ((1L, Some("1:8"))), "cross-batch repeat must flag")
    // RETRY batch 0 (at-least-once): its own prior counts are REPLACED,
    // not added — the block is repeated via batch 1 (span exactly 0:7),
    // but doc 0's unique tail grams must NOT be flagged, which is what a
    // double-counted append would do (span would widen to 0:9)
    assert(run(b0, 0L)(0L) == ((1L, Some("0:7"))),
      "retried batch must overwrite its partial counts, not double-count")
  }

  test("BatchStore reader rules: unmarked consolidated invisible, folded excluded even if present") {
    val root = java.nio.file.Files.createTempDirectory("bstore").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val data = s"$root/data"
    val markers = s"$root/compactions"
    for (id <- Seq(0L, 1L, -1L))
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$data/batch_id=$id"))
    def ids(ex: Option[Long]) = graft.pipeline.BatchStore
      .readableParts(fs, data, markers, ex).map(_._1).toSet
    // crash window 1: consolidated partition exists, marker does not —
    // the consolidated data is INVISIBLE (no double count), sources live
    assert(ids(None) == Set(0L, 1L), s"unmarked consolidated must hide: ${ids(None)}")
    // the in-flight batch's own partition is always excluded
    assert(ids(Some(0L)) == Set(1L), "own partition must be excluded")
    // commit the marker: -1 folds {0, 1}
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$markers/-1"), true)
    out.write("0\n1".getBytes("UTF-8")); out.close()
    // crash window 2: marker committed, stale sources not yet deleted —
    // folded ids are EXCLUDED even though their directories exist
    assert(ids(None) == Set(-1L), s"folded sources must hide: ${ids(None)}")
  }

  test("compaction retry is idempotent no-op; folded-lineage writes refuse") {
    val store = java.nio.file.Files.createTempDirectory("bstorelife").toString
    def run(doc: (Long, String), id: Long) =
      Dedup.repeatedSubstringStoreStep(Seq(doc).toDF("doc_id", "text"),
        store, "text", "doc_id", minLen = 8, batchId = id)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), Option(r.getString(4)))).toMap
    assert(run((0L, "a1 a2 a3 a4 a5 a6 a7 a8"), 0L)(0L) == ((0L, None)))
    assert(run((10L, "b1 b2 b3 b4 b5 b6 b7 b8"), 1L)(10L) == ((0L, None)))
    assert(run((20L, "c1 c2 c3 c4 c5 c6 c7 c8"), 2L)(20L) == ((0L, None)))
    val folded = Dedup.repeatedSubstringStoreCompact(spark, store,
      compactId = -1L, upToBatchId = 1L)
    assert(folded.toSet == Set(0L, 1L), s"folded: $folded")
    // RETRY the committed compaction (at-least-once foreachBatch replays
    // the triggering batch, so the same compactId recurs): must be a
    // no-op, never a throw — a rethrow would wedge the stream on every
    // restart (the r15 ADVICE finding)
    val again = Dedup.repeatedSubstringStoreCompact(spark, store,
      compactId = -1L, upToBatchId = 1L)
    assert(again.isEmpty, "retried compaction must no-op, not re-fold")
    // verdicts byte-identical after the retried compaction
    assert(run((30L, "x9 a1 a2 a3 a4 a5 a6 a7 a8"), 3L)(30L) ==
      ((1L, Some("1:8"))), "verdicts must survive a retried compaction")
    // the retry also retries the LAZY SOURCE CLEANUP: resurrect a folded
    // source partition (crash between marker commit and delete), re-run
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stale = new org.apache.hadoop.fs.Path(s"$store/gramcounts/batch_id=0")
    fs.mkdirs(stale)
    Dedup.repeatedSubstringStoreCompact(spark, store, -1L, 1L)
    assert(!fs.exists(stale), "retried compaction must retry source cleanup")
    // LINEAGE GUARD: a storeDir that outlives its stream checkpoint sees
    // batch ids restart at 0 — id 0 is folded, so its partition would be
    // invisible to every reader forever. The write must refuse loudly
    // (silent data loss otherwise), while unfolded ids keep writing.
    intercept[IllegalStateException] {
      run((40L, "d1 d2 d3 d4 d5 d6 d7 d8"), 0L)
    }
    assert(run((50L, "e1 e2 e3 e4 e5 e6 e7 e8"), 4L)(50L) == ((0L, None)),
      "unfolded batch ids must keep writing")
  }

  test("compaction folds superseded markers: one live marker, transitive exclusions survive") {
    // marker files must not accumulate with compaction history (readMarkers
    // opens every file on every store step — the r15 ADVICE finding): a
    // later compaction folds an earlier consolidated partition, merges its
    // marker's folded ids into the new marker, and deletes the superseded
    // marker file. Exclusions (reader rules + the lineage write guard)
    // must survive the prune via the transitive list.
    val store = java.nio.file.Files.createTempDirectory("bmarkers").toString
    def run(doc: (Long, String), id: Long) =
      Dedup.repeatedSubstringStoreStep(Seq(doc).toDF("doc_id", "text"),
        store, "text", "doc_id", minLen = 8, batchId = id)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), Option(r.getString(4)))).toMap
    run((0L, "a1 a2 a3 a4 a5 a6 a7 a8"), 0L)
    run((10L, "b1 b2 b3 b4 b5 b6 b7 b8"), 1L)
    assert(Dedup.repeatedSubstringStoreCompact(spark, store, -1L, 1L)
      .toSet == Set(0L, 1L))
    run((20L, "c1 c2 c3 c4 c5 c6 c7 c8"), 2L)
    run((30L, "d1 d2 d3 d4 d5 d6 d7 d8"), 3L)
    assert(Dedup.repeatedSubstringStoreCompact(spark, store, -2L, 3L)
      .toSet == Set(-1L, 2L, 3L), "second compaction folds the first's output")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val markers = graft.pipeline.BatchStore.readMarkers(
      fs, s"$store/compactions")
    assert(markers.keySet == Set(-2L),
      s"superseded marker must prune: ${markers.keySet}")
    assert(markers(-2L).toSet == Set(0L, 1L, -1L, 2L, 3L),
      s"transitive folds must merge into the live marker: ${markers(-2L)}")
    // the lineage guard still refuses a TRANSITIVELY folded batch id
    intercept[IllegalStateException] {
      run((40L, "e1 e2 e3 e4 e5 e6 e7 e8"), 0L)
    }
    // verdicts intact across both compactions
    assert(run((50L, "x9 a1 a2 a3 a4 a5 a6 a7 a8"), 4L)(50L) ==
      ((1L, Some("1:8"))), "verdicts must survive the marker fold")
  }

  test("auto-compaction: mid-stream self-fold preserves verdicts, bounds partitions") {
    // maxStoreParts turns the store loops self-maintaining: once the
    // readable partition count exceeds the cap the step folds history
    // itself (compactId derived from the triggering batch, so a replayed
    // trigger no-ops on the committed marker). Verdicts must match a
    // never-compacted control store batch for batch, and the partition
    // count must stay bounded while the control store's grows.
    val auto = java.nio.file.Files.createTempDirectory("wnauto").toString
    val ctl = java.nio.file.Files.createTempDirectory("wnctl").toString
    def run(dir: String, doc: (Long, String), id: Long, cap: Int) =
      Dedup.winnowingStoreStep(Seq(doc).toDF("doc_id", "text"), dir, "text",
        "doc_id", batchId = id, maxStoreParts = cap)
        .select("id_new", "id_store").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten",
      "red orange yellow green blue indigo violet pink gray black",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa", // dup of 0
      "north south east west up down left right front back",
      "one two three four five six seven eight nine ten")         // dup of 1
    texts.zipWithIndex.foreach { case (t, i) =>
      val a = run(auto, (i * 10L, t), i.toLong, cap = 2)
      val c = run(ctl, (i * 10L, t), i.toLong, cap = 0)
      assert(a == c, s"batch $i: auto-compacted store diverged: $a vs $c")
    }
    val fs = new org.apache.hadoop.fs.Path(auto)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def parts(dir: String) = graft.pipeline.BatchStore.readableParts(
      fs, s"$dir/fps", s"$dir/compactions/fps", None)
    assert(parts(auto).size <= 3,
      s"auto store must stay bounded: ${parts(auto).map(_._1)}")
    assert(parts(ctl).size == 6, // one partition per batch (dups write empty)
      s"control store grows unbounded: ${parts(ctl).map(_._1)}")
    assert(parts(auto).exists(_._1 < 0), "auto store must hold a consolidated part")
  }

  test("store-prune semi survives the fat-batch (no-broadcast) path") {
    // the r14 judge finding: the broadcast-semi store prune had no
    // cardinality guard — a fat batch would hit the broadcast ceiling
    // and fail the stream. probeCap = 0 forces the shuffled-semi shape;
    // verdicts must be identical to the broadcast shape.
    val lineStore = java.nio.file.Files.createTempDirectory("t86fat").toString
    def lines(doc: (Long, String), id: Long) =
      TextAnalysis.c4LineCleanStoreStep(Seq(doc).toDF("doc_id", "text"),
        lineStore, "text", "doc_id", minWords = 3, batchId = id,
        probeCap = 0L)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(5))).toMap
    assert(lines((0L, "shared boilerplate line here."), 0L)(0L) ==
      (("shared boilerplate line here.", 0L)))
    assert(lines((10L, "shared boilerplate line here.\nfresh unique line two."),
      1L)(10L) == (("fresh unique line two.", 1L)),
      "fat-batch path must still dedup prior-seen lines")
    val attrStore = java.nio.file.Files.createTempDirectory("p11fat").toString
    def attrs(docs: Seq[(Long, String)], id: Long) =
      graft.pipeline.Curation.attributeStoreStep(docs.toDF("doc_id", "text"),
        attrStore, id, "text", "doc_id", Seq("the", "a"),
        Seq("en" -> Seq("the", "and")), probeCap = 0L)
        .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(attrs(Seq((0L, "the cat sat on the mat")), 0L)(0L),
      "founding doc is canonical")
    assert(!attrs(Seq((10L, "the cat sat on the mat")), 1L)(10L),
      "fat-batch path must still see prior fingerprints")
  }

  test("minhash store step: retry never self-dedups; compaction preserves canonical resolution") {
    val dir = java.nio.file.Files.createTempDirectory("mhstore").toString
    def run(docs: Seq[(Long, String)], id: Long) =
      Dedup.minhashStoreStep(docs.toDF("doc_id", "text"), dir, "text",
        "doc_id", shingleWords = 2, numHashes = 32, bands = 8,
        threshold = 0.5, batchId = id)
        .select("id_new", "id_store").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = Seq((0L, "alpha beta gamma delta epsilon"),
      (1L, "one two three four five"))
    assert(run(b0, 0L).isEmpty, "founding batch has nothing to collide with")
    // RETRY the founding batch: the pre-r14 append-only store would
    // dedup docs 0/1 against their own first-attempt signatures
    assert(run(b0, 0L).isEmpty, "retried founding batch must not self-dedup")
    assert(run(Seq((10L, "alpha beta gamma delta epsilon")), 1L) ==
      Set((10L, 0L)), "cross-batch dup resolves to the canonical doc")
    assert(run(Seq((20L, "red green blue yellow purple")), 2L).isEmpty)
    val folded = Dedup.minhashStoreCompact(spark, dir,
      compactId = -1L, upToBatchId = 1L)
    assert(folded.toSet == Set(0L, 1L), s"folded: $folded")
    // post-compaction: a dup of a folded doc still resolves canonically
    assert(run(Seq((30L, "one two three four five")), 3L) == Set((30L, 1L)),
      "consolidated signatures must keep resolving dups")
  }

  test("simhash store loop: identical text caught cross-batch, retry never self-dedups") {
    val dir = java.nio.file.Files.createTempDirectory("shstore").toString
    def run(docs: Seq[(Long, String)], id: Long) =
      Dedup.simhashStoreStep(docs.toDF("doc_id", "text"), dir, "text",
        "doc_id", maxDist = 3, batchId = id)
        .select("id_new", "id_store").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b0 = Seq((0L, "the quick brown fox jumps over the lazy dog today"))
    assert(run(b0, 0L).isEmpty, "founding batch is clean")
    assert(run(b0, 0L).isEmpty, "retried founding batch must not self-dedup")
    assert(run(Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "entirely different content with other vocabulary words used")),
      1L) == Set((10L, 0L)), "identical text must pair at hamming 0")
  }

  test("winnowing store loop: deterministic candidates, retry, compaction") {
    val dir = java.nio.file.Files.createTempDirectory("wnstore").toString
    def run(docs: Seq[(Long, String)], id: Long) =
      Dedup.winnowingStoreStep(docs.toDF("doc_id", "text"), dir, "text",
        "doc_id", batchId = id)
        .select("id_new", "id_store").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert(run(Seq((0L, shared)), 0L).isEmpty)
    assert(run(Seq((0L, shared)), 0L).isEmpty,
      "retried founding batch must not self-dedup")
    assert(run(Seq((10L, shared),
      (11L, "one two three four five six seven eight nine ten")), 1L) ==
      Set((10L, 0L)), "shared fingerprint run must pair")
    assert(run(Seq((20L, "red orange yellow green blue indigo violet pink gray black")),
      2L).isEmpty)
    val folded = Dedup.winnowingStoreCompact(spark, dir,
      compactId = -1L, upToBatchId = 1L)
    assert(folded.toSet == Set(0L, 1L), s"folded: $folded")
    assert(run(Seq((30L, "one two three four five six seven eight nine ten")), 3L) ==
      Set((30L, 11L)), "consolidated fingerprints must keep pairing")
  }

  test("substring store compaction: verdicts byte-identical, torn compaction inert") {
    val store = java.nio.file.Files.createTempDirectory("d21compact").toString
    def run(doc: (Long, String), id: Long) =
      Dedup.repeatedSubstringStoreStep(Seq(doc).toDF("doc_id", "text"),
        store, "text", "doc_id", minLen = 8, batchId = id)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), Option(r.getString(4)))).toMap
    assert(run((0L, "a1 a2 a3 a4 a5 a6 a7 a8 x1 x2"), 0L)(0L) == ((0L, None)))
    assert(run((10L, "y1 a1 a2 a3 a4 a5 a6 a7 a8 y2"), 1L)(10L) == ((1L, Some("1:8"))))
    assert(run((20L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"), 2L)(20L) == ((0L, None)))
    // fold batches 0 and 1 (batch 2 is the latest — still retryable)
    val folded = Dedup.repeatedSubstringStoreCompact(spark, store,
      compactId = -1L, upToBatchId = 1L)
    assert(folded.toSet == Set(0L, 1L), s"folded: $folded")
    // the a-block now counts 2 via the CONSOLIDATED partition only —
    // a batch repeating it must flag exactly as before compaction
    assert(run((30L, "b1 b2 a1 a2 a3 a4 a5 a6 a7 a8"), 3L)(30L) ==
      ((1L, Some("2:9"))), "consolidated counts must flag identically")
    // retry of the unfolded latest batch: byte-identical report
    assert(run((20L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"), 2L)(20L) == ((0L, None)),
      "retrying the unfolded latest batch must stay clean")
    // torn-compaction simulation: a consolidated partition with NO
    // marker (here: a foreign store's counts copied in as batch_id=-77)
    // must be invisible — the probe doc's grams would otherwise flag
    val victim = java.nio.file.Files.createTempDirectory("d21victim").toString
    Dedup.repeatedSubstringStoreStep(
      Seq((99L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text"),
      victim, "text", "doc_id", minLen = 8, batchId = 0L).collect()
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$victim/gramcounts/batch_id=0"), fs,
      new org.apache.hadoop.fs.Path(s"$store/gramcounts/batch_id=-77"),
      false, spark.sessionState.newHadoopConf()))
    assert(run((40L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), 4L)(40L) == ((0L, None)),
      "unmarked consolidated partition must never count")
  }

  test("line store compaction: set union preserved across the fold") {
    val store = java.nio.file.Files.createTempDirectory("t86compact").toString
    def run(doc: (Long, String), id: Long) =
      TextAnalysis.c4LineCleanStoreStep(Seq(doc).toDF("doc_id", "text"),
        store, "text", "doc_id", minWords = 3, batchId = id)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(5))).toMap
    assert(run((0L, "shared boilerplate line here."), 0L)(0L) ==
      (("shared boilerplate line here.", 0L)))
    assert(run((10L, "another unique line entirely."), 1L)(10L) ==
      (("another unique line entirely.", 0L)))
    assert(run((20L, "third unique line of text."), 2L)(20L) ==
      (("third unique line of text.", 0L)))
    val folded = TextAnalysis.c4LineStoreCompact(spark, store,
      compactId = -1L, upToBatchId = 1L)
    assert(folded.toSet == Set(0L, 1L), s"folded: $folded")
    // both folded batches' hashes still win the election from the
    // consolidated partition
    assert(run((30L, "shared boilerplate line here.\nanother unique line entirely."),
      3L)(30L) == (("", 2L)),
      "consolidated line hashes must keep winning the election")
  }

  test("substring CLEAN store step: cross-batch repeats cut from the arriving batch") {
    val store = java.nio.file.Files.createTempDirectory("d23spec").toString
    val b0 = Seq((0L, "a1 a2 a3 a4 a5 a6 a7 a8 x1 x2")).toDF("doc_id", "text")
    val b1 = Seq((10L, "y1 a1 a2 a3 a4 a5 a6 a7 a8 y2")).toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      Dedup.repeatedSubstringCleanStoreStep(b, store, "text", "doc_id",
        minLen = 8, batchId = id)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // batch 0: store empty, nothing repeated -> text passes through intact
    assert(run(b0, 0L)(0L) == (("a1 a2 a3 a4 a5 a6 a7 a8 x1 x2", 10L, 0L)),
      "first batch must pass through uncut")
    // batch 1: the block is now corpus-repeated -> cut, survivors reassemble
    assert(run(b1, 1L)(10L) == (("y1 y2", 10L, 8L)),
      "cross-batch repeat must be cut from the arriving doc")
  }

  test("line clean store step: prior batches win the election, retry reads store not self") {
    val store = java.nio.file.Files.createTempDirectory("t86spec").toString
    val b0 = Seq((0L, "shared boilerplate line here.\nunique zero line here."))
      .toDF("doc_id", "text")
    val b1 = Seq((10L, "shared boilerplate line here.\nunique ten line here."))
      .toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      TextAnalysis.c4LineCleanStoreStep(b, store, "text", "doc_id",
        minWords = 3, batchId = id)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(3), r.getLong(5))).toMap
    // batch 0: store empty — both lines are first occurrences
    assert(run(b0, 0L)(0L) ==
      (("shared boilerplate line here.\nunique zero line here.", 2L, 0L)),
      "first batch must keep all its first occurrences")
    // batch 1: the shared line lost to batch 0's store entry
    assert(run(b1, 1L)(10L) == (("unique ten line here.", 1L, 1L)),
      "cross-batch duplicate line must drop")
    // RETRY batch 0: its own partition is excluded from the prior read,
    // but batch 1's committed hashes now count as prior — the shared
    // line yields to the store (the substring store-step asymmetry)
    assert(run(b0, 0L)(0L) == (("unique zero line here.", 1L, 1L)),
      "retried batch must read the store, never its own partial")
  }

  test("mojibake profile: each artifact family counted, clean text never flags") {
    val docs = Seq(
      (0L, "caffÃ© and crÃ¨me"),      // two accented-Latin corruptions
      (1L, "perfectly clean text"),
      (2L, "â€œbad quote Â here �"),  // quote run + stray Â + U+FFFD
      (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeProfile(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(6)))
      .toMap
    assert(out(0L) == ((2L, 0L, 0L, 0L, true)), s"latin1: ${out(0L)}")
    assert(out(1L) == ((0L, 0L, 0L, 0L, false)), s"clean: ${out(1L)}")
    assert(out(2L) == ((0L, 1L, 1L, 1L, true)), s"mixed: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0L, 0L, false)), s"empty: ${out(3L)}")
  }

  test("c4 line clean: filters, corpus-wide first-occurrence dedup, page verdict") {
    val docs = Seq(
      (0L, "alpha beta gamma delta.\nsubscribe to our newsletter today.\n" +
        "read more\nunique zero line here."),
      (1L, "alpha beta gamma delta.\nsubscribe to our newsletter today.\n" +
        "unique one line here."),
      (2L, "no terminal punct line\nlorem ipsum dolor sit amet.\nshort.\n" +
        "unique two line here."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4LineClean(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))
      .toMap
    // doc 0: all three passing lines are first occurrences; 'read more'
    // fails the filter (no terminal punct, < 3 words); page verdict holds
    assert(out(0L) == (("alpha beta gamma delta.\n" +
      "subscribe to our newsletter today.\nunique zero line here.",
      4L, 3L, 1L, 0L, true)), s"doc0: ${out(0L)}")
    // doc 1: its first two lines lost the corpus-wide election to doc 0
    assert(out(1L) == (("unique one line here.", 3L, 1L, 0L, 2L, false)),
      s"doc1: ${out(1L)}")
    // doc 2: two filter drops ('short.' has one word), lorem trips verdict
    assert(out(2L) == (("lorem ipsum dolor sit amet.\nunique two line here.",
      4L, 2L, 2L, 0L, false)), s"doc2: ${out(2L)}")
  }

  test("script profile: homoglyph substitution trips mixed-token, single-script text never does") {
    val docs = Seq(
      (0L, "plain ascii text"),
      (1L, "pаypal login page"),           // Cyrillic а inside a Latin token
      (2L, "ascii then привет мир"),            // pure-Cyrillic TOKENS: not mixed
      (3L, "οmega sιgn here"))         // Greek ο/ι inside Latin tokens
      .toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getBoolean(6)))
      .toMap
    assert(out(0L) == ((14L, 0L, 0L, 0L, false)), s"ascii: ${out(0L)}")
    assert(out(1L)._2 == 1L && out(1L)._4 == 1L && out(1L)._5,
      s"homoglyph must flag: ${out(1L)}")
    assert(out(2L)._2 == 9L && out(2L)._4 == 0L && !out(2L)._5,
      s"single-script Cyrillic tokens must NOT flag: ${out(2L)}")
    assert(out(3L)._3 == 2L && out(3L)._4 == 2L && out(3L)._5,
      s"Greek homoglyphs must flag: ${out(3L)}")
  }

  test("html extract: strip + entity decode + link density, hand-computed") {
    val docs = Seq(
      (0L, """<p>abcde</p><a href="/x">12345</a>"""),      // 10 visible, 5 linked
      (1L, """<p>A &amp;&lt;B</p>"""),                      // entities decode
      (2L, """<div></div>"""))                              // empty page
      .toDF("doc_id", "html")
    val out = TextAnalysis.htmlExtract(docs, "html", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getString(5)))
      .toMap
    assert(out(0L) == ((10L, 5L, 4L, Some(0.5), "abcde12345")), s"${out(0L)}")
    assert(out(1L)._5 == "A &<B" && out(1L)._1 == 5L, s"decode: ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 2L, None, "")), s"empty: ${out(2L)}")
  }

  test("length bias: hand-computed rate/mean/effect, tie-only data nulls out") {
    val pairs = Seq(
      ("a b c", "a"), ("a", "a b c"), ("x y", "p q"), ("a b c d", "a b"))
      .toDF("chosen", "rejected")
    val r = Preference.lengthBias(pairs, "chosen", "rejected").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 1L, 2L)), s"$r")
    assert(r.getDouble(3) == 0.666667 && r.getDouble(4) == 0.5, s"$r")
    // d = (2,-2,0,2): var = (12 - 1)/3, effect = 0.5/sqrt(11/3)
    assert(r.getDouble(5) == 0.261116, s"$r")
    val ties = Seq(("a b", "c d"), ("e", "f")).toDF("chosen", "rejected")
    val r2 = Preference.lengthBias(ties, "chosen", "rejected").collect()(0)
    assert(r2.isNullAt(3) && r2.getDouble(4) == 0.0 && r2.isNullAt(5),
      s"tie-only: $r2")
  }

  test("unigram surprisal: rare-token docs score higher than common-token docs") {
    val corpus = Seq(
      (0L, "the the the the the"),
      (1L, "the the the the rare"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.unigramSurprisal(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(1L) > scored(0L), "the doc containing the rare token must surprise more")
    // doc 0 is all 'the': p = 9/10, avg = -ln(0.9)
    assert(math.abs(scored(0L) - (-math.log(9.0 / 10.0))) < 1e-6)
  }

  test("bigram surprisal: seen bigrams score MLE, unseen back off through the unigram") {
    // LM trained on doc 0 only; doc 1 repeats a trained bigram, doc 2's
    // bigram is unseen but both words are known unigrams (stupid backoff),
    // doc 3's second word is OOV entirely (unigram floor)
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val score = TextAnalysis.bigramSurprisal(
      Seq((1L, "a b"), (2L, "b b"), (3L, "a z")).toDF("doc_id", "text"),
      "text", "doc_id", refCorpus = Some(ref))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // trained counts: bigrams (a,b)=2, (b,a)=1; unigrams a=2, b=2, total=4
    assert(math.abs(score(1L) - (-math.log(2.0 / 2.0))) < 1e-6,
      "seen bigram must score c(a,b)/c(a,.) = 1")
    assert(math.abs(score(2L) - (-math.log(0.4 * 2.0 / 4.0))) < 1e-6,
      "unseen bigram must back off to alpha * p_uni(b)")
    assert(math.abs(score(3L) - (-math.log(0.4 * 0.5 / 4.0))) < 1e-6,
      "OOV continuation must floor at alpha * oovFloor / total")
  }

  test("kneser-ney: every smoothing leg is analytic; model normalizes to 1") {
    // trained bigrams: (a,b)=2, (b,a)=2, (a,c)=1, (d,a)=1, (a,x)=1,
    // (x,y)=1 -> nbb=6; ctx a: nc=4, n1=3; cont: a=2, b=c=x=y=1
    val ref = Seq((0L, "a b a b a c"), (2L, "d a x y")).toDF("doc_id", "text")
    def p(nb: Option[Int], nc: Option[Int], n1: Int, nw: Option[Int]): Double = {
      val pc = nw.map(_.toDouble).getOrElse(0.5) / 6
      nc.map(c => (nb.map(_.toDouble - 0.75).getOrElse(0.0) +
        ((0.75 * n1) * pc)) / c).getOrElse(pc)
    }
    val probes = Seq((1L, "a b"), (3L, "a y"), (5L, "b c"),
      (7L, "q a"), (9L, "q zz")).toDF("doc_id", "text")
    val score = TextAnalysis.knSurprisal(probes, "text", "doc_id",
      refCorpus = Some(ref))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def expect(v: Double): Double =
      math.floor(-math.log(v) * 1000000.0 + 0.5) / 1000000.0
    assert(score(1L) == expect(p(Some(2), Some(4), 3, Some(1))), "seen bigram")
    assert(score(3L) == expect(p(None, Some(4), 3, Some(1))),
      "unseen bigram, seen context: pure continuation interpolation")
    assert(score(5L) == expect(p(None, Some(2), 1, Some(1))), "other context")
    assert(score(7L) == expect(p(None, None, 0, Some(2))),
      "unseen context backs off to P_cont")
    assert(score(9L) == expect(p(None, None, 0, None)), "OOV floor")
    // KN invariant: sum over the full continuation vocabulary of
    // P(w2 | a) is exactly 1 — the discounted mass is fully re-spent
    val vocabProbes = Seq("a", "b", "c", "x", "y").zipWithIndex
      .map { case (w, i) => (100L + i, s"a $w") }.toDF("doc_id", "text")
    val mass = TextAnalysis.knSurprisal(vocabProbes, "text", "doc_id",
      refCorpus = Some(ref))
      .collect().map(r => math.exp(-r.getDouble(2))).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"continuation mass $mass != 1")
  }

  test("kneser-ney: randomized corpora match an independent reference exactly") {
    val rnd = new scala.util.Random(91)
    def word(): String =
      (0 until rnd.nextInt(3) + 1).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    def doc(minW: Int): String =
      (0 until rnd.nextInt(6) + minW).map(_ => word()).mkString(" ")
    for (_ <- 0 until 8) {
      val refDocs = (0 until rnd.nextInt(5) + 4).map(_ => doc(2))
      // scored docs overlap the ref vocab AND introduce novel words
      // ('zq' can never be generated above) so every smoothing leg fires
      val scored = (0 until 5).map(i =>
        (i.toLong, doc(2) + (if (i % 2 == 0) " zq " + word() else "")))
      // independent reference: same arithmetic, built from plain maps
      val refBg = refDocs.flatMap { d =>
        val t = d.split("\\s+").filter(_.nonEmpty)
        t.zip(t.drop(1))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val nc = refBg.groupBy(_._1._1).map { case (w, m) =>
        w -> m.values.sum }
      val n1 = refBg.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
      val nw = refBg.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
      val nbb = refBg.size.toLong
      def prob(w1: String, w2: String): Double = {
        val pc = nw.get(w2).map(_.toDouble).getOrElse(0.5) / nbb
        nc.get(w1) match {
          case Some(c1) =>
            (refBg.get((w1, w2)).map(_.toDouble - 0.75).getOrElse(0.0) +
              ((0.75 * n1(w1)) * pc)) / c1
          case None => pc
        }
      }
      val want = scored.flatMap { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        if (t.length < 2) None else {
          val bgs = t.zip(t.drop(1))
          val byType = bgs.groupBy(identity).map { case (k, v) =>
            k -> v.size.toLong }
          val n = bgs.length.toLong
          val sum = byType.map { case ((a, b), c) =>
            c * math.floor(-math.log(prob(a, b)) * 1000000.0 + 0.5).toLong
          }.sum
          Some(id -> (n,
            math.floor(sum.toDouble / n + 0.5) / 1000000.0))
        }
      }.toMap
      val got = TextAnalysis.knSurprisal(scored.toDF("doc_id", "text"),
        "text", "doc_id", refCorpus = Some(refDocs.toDF("text")))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(got == want, s"KN mismatch:\ngot  $got\nwant $want")
    }
  }

  test("winnowing: shared run >= window+k-1 words guarantees a shared fingerprint") {
    // k=3, window=4: the guarantee threshold is 6 words. Docs 20/21 share
    // exactly a 6-word run embedded in otherwise-disjoint text; doc 22 is
    // disjoint from both.
    val shared = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq(
      (20L, s"u1 u2 u3 $shared v1 v2"),
      (21L, s"w1 w2 $shared x1 x2 x3"),
      (22L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingCandidates(corpus, "text", "doc_id",
      k = 3, window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((20L, 21L)),
      s"expected exactly the sharing pair, got $pairs")
  }

  test("phash near-dup pairs byte-identical media; generic fingerprints pair within hamming 3") {
    val media = Multimodal.asMediaTable(Seq(
      (10L, "same payload"), (11L, "same payload"), (12L, "other payload"))
      .toDF("doc_id", "text"), "doc_id", "text", "image")
    val pairs = Multimodal.phashNearDups(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((10L, 11L, 0)))
    // the generic machinery on hand-built fingerprints: one bit apart
    // pairs, far fingerprints don't
    val fps = Seq((1L, 0x00000000000000FFL), (2L, 0x00000000000000FEL),
      (3L, 0x7F00FF00FF00FF00L)).toDF("id", "sim")
    val got = Dedup.fingerprintNearDups(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1)))
  }

  test("semantic dedup keeps exactly one representative per cluster") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), "a"), (1L, Array(0.9f, 0.1f), "a"),
      (2L, Array(0.0f, 1.0f), "b"), (3L, Array(0.1f, 0.9f), "b"),
      (4L, Array(0.05f, 0.95f), "b"))
      .toDF("vec_id", "embedding", "grp")
    val cents = Similarity.centroids(vecs, "embedding", "grp")
    val out = Similarity.semanticDedup(vecs, cents)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val byCluster = out.groupBy(_._2)
    assert(byCluster.keySet == Set("a", "b"))
    // exactly one keep per cluster, and it is the closest-to-centroid vector
    assert(byCluster.values.forall(_.count(_._3) == 1))
    assert(out.filter(_._3).map(_._1).toSet == Set(0L, 4L))
  }

  private val retrievalDocs = Seq(
    (0L, "apple banana apple"),
    (1L, "banana cherry"),
    (2L, "cherry cherry cherry durian"))
    .toDF("doc_id", "text")

  test("bm25: hand-computed scores, matched docs only, rank order") {
    // N=3, avgdl=3; idf(apple)=ln(2.5/1.5+1), idf(cherry)=ln(1.5/2.5+1)
    // doc0: apple tf=2 dl=3 -> 0.980829*1.375    = 1.348640
    // doc2: cherry tf=3 dl=4 -> 0.470004*1.466667 = 0.689339
    // doc1: cherry tf=1 dl=2 -> 0.470004*1.157895 = 0.544215
    val q = Seq(("q1", "apple cherry")).toDF("q_id", "q_text")
    val got = Retrieval.bm25TopK(retrievalDocs, q, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(t => (t._1, t._2, t._4)).toSeq ==
      Seq(("q1", 0L, 1), ("q1", 2L, 2), ("q1", 1L, 3)))
    val scores = got.map(_._3)
    assert(math.abs(scores(0) - 1.348640) < 1e-4)
    assert(math.abs(scores(1) - 0.689339) < 1e-4)
    assert(math.abs(scores(2) - 0.544215) < 1e-4)
  }

  test("tfidf top terms: hand-computed weights, tie breaks on term") {
    // doc1's banana and cherry tie exactly (tf 1, dl 2, df 2) -> banana wins
    val got = Retrieval.tfidfTopTerms(retrievalDocs, k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, "apple"), (1L, "banana"), (2L, "cherry")))
    assert(math.abs(got(0)._3 - 2.0 / 3 * math.log(3.0)) < 1e-4)
    assert(math.abs(got(1)._3 - 0.5 * math.log(1.5)) < 1e-4)
    assert(math.abs(got(2)._3 - 0.75 * math.log(1.5)) < 1e-4)
  }

  test("bm25 against a staged postings store matches the direct path") {
    val q = Seq(("q1", "apple cherry"), ("q2", "durian")).toDF("q_id", "q_text")
    val direct = Retrieval.bm25TopK(retrievalDocs, q, k = 5).collect().toSet
    val store = Retrieval.postings(retrievalDocs)
    val served = Retrieval.bm25TopKAgainstStore(store, q, k = 5).collect().toSet
    assert(served == direct && served.nonEmpty)
  }

  test("bm25 hard negatives: positive excluded, remainder re-ranked") {
    val q = Seq(("q1", "apple cherry")).toDF("q_id", "q_text")
    // positive is the top-1 doc: negatives are ranks 2..3 renumbered
    val posTop = q.withColumn("pos_id", lit(0L))
    val got = Retrieval.hardNegatives(retrievalDocs, posTop, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(got.toSeq == Seq(("q1", 0L, 2L, 1), ("q1", 0L, 1L, 2)))
    // positive mid-ranking: survivors keep relative order, ranks close up
    val posMid = q.withColumn("pos_id", lit(2L))
    val got2 = Retrieval.hardNegatives(retrievalDocs, posMid, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(got2.toSeq == Seq(("q1", 2L, 0L, 1), ("q1", 2L, 1L, 2)))
  }

  test("sequence packing: per-source offsets, start-offset bin, no splits") {
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "a b c d e", "A"), (3L, "a b", "A"),
      (4L, "a b c d e f g h i j", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.packSequences(docs, seqTokens = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // A starts: 0, 3, 8 -> bins 0, 0, 2; B: one doc at offset 0
    assert(got.toSeq == Seq(
      (1L, "A", 3L, 0L, 0L), (2L, "A", 5L, 0L, 3L), (3L, "A", 2L, 2L, 0L),
      (4L, "B", 10L, 0L, 0L)))
  }

  test("gopher rules: line ratios, symbol ratio, alpha fraction, stop gate") {
    val good = (("the quick brown fox jumps over that lazy dog and more " * 6).trim)
    val docs = Seq(
      (1L, good),                                   // passes every rule
      (2L, ("- item\n" * 19) + "plain " + good),    // 19/20 bullet lines: fails ok_bullets
      (3L, "wait...\nmore...\nfine\n" + good),      // 2/3+1 ellipsis lines
      (4L, ("12 34 " * 30).trim),                   // numeric: fails ok_alpha + ok_stops
      (5L, ("### " + good + " ... ... ... ... ... ...")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRuleReport(docs, minWords = 10)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("ok_bullets") && r(2L).getAs[Double]("bullet_ratio") == 0.95)
    assert(!r(3L).getAs[Boolean]("ok_ellipsis") && r(3L).getAs[Double]("ellipsis_ratio") == 0.5)
    assert(!r(4L).getAs[Boolean]("ok_alpha") && r(4L).getAs[Long]("stop_hits") == 0L)
    assert(!r(5L).getAs[Boolean]("ok_symbols") && !r(5L).getAs[Boolean]("keep"))
  }

  test("training shuffle: deterministic, seed-sensitive, dense in-shard ranks") {
    val docs = (0L until 64L).toDF("doc_id")
    val a = TextAnalysis.trainingShuffle(docs, "s1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = TextAnalysis.trainingShuffle(docs, "s1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c = TextAnalysis.trainingShuffle(docs, "s2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sorted.toSeq == b.sorted.toSeq)            // reproducible
    assert(a.sorted.toSeq != c.sorted.toSeq)            // seed reshuffles
    assert(a.forall { case (_, s, _) => s >= 0 && s < 16 })
    // ranks are dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("target mix: binding source keeps all, others downsample toward weights") {
    val docs = (0L until 900L).map(i =>
      (i, if (i < 600) "web" else if (i < 870) "books" else "code"))
      .toDF("doc_id", "source")
    // targets 1/1/1 but code has only 30 docs -> K = 30, rate web = 30/600
    val kept = TextAnalysis.targetMixSample(docs,
      Map("web" -> 1.0, "books" -> 1.0, "code" -> 1.0)).collect()
    val bySrc = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc("code") == 30)                          // rate 1.0: keeps all
    val webRate = kept.find(_.getString(1) == "web").get.getDouble(2)
    assert(math.abs(webRate - 0.05) < 1e-9)
    // md5 sampling is approximate but unbiased: web keeps ~30 of 600
    assert(bySrc("web") > 10 && bySrc("web") < 60)
  }

  test("boilerplate ngrams: planted shared template flagged, unique docs not") {
    val template = "all rights reserved by the example corp"
    val docs = (0L until 6L).map(i => (i, template)) ++
      Seq((10L, "alpha beta gamma delta epsilon zeta"),
          (11L, "one two three four five six seven"))
    val r = TextAnalysis.boilerplateNgrams(docs.toDF("doc_id", "text"), "text", "doc_id",
      n = 3, dfCutoff = 2, frac = 0.5)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("boilerplate")).toMap
    (0L until 6L).foreach(i => assert(r(i), s"doc $i should be boilerplate"))
    assert(!r(10L) && !r(11L))
  }

  test("pq: kmeans-trained codebook encodes clusters to their own codes; ADC ranks dups first") {
    // 4-dim vectors, m=2 subspaces of 2 dims; each subspace has two well-
    // separated clusters around (0,0) and (10,10)
    val corpus = Seq(
      (0L, Array(0f, 1f, 10f, 11f)), (1L, Array(1f, 0f, 11f, 10f)),
      (2L, Array(10f, 11f, 0f, 1f)), (3L, Array(11f, 10f, 1f, 0f)),
      (4L, Array(0f, 1f, 10f, 11f))) // exact dup of vec 0
      .toDF("vec_id", "embedding")
    // train each subspace's K=2 codebook with Lloyd over the sliced vectors
    val cb = (0 until 2).map { s =>
      val sliced = corpus.select(col("vec_id"),
        slice(col("embedding"), s * 2 + 1, 2).as("embedding"))
      val init = sliced.where(col("vec_id") < 2)
        .select(col("vec_id").cast("int").as("cluster"),
          col("embedding").cast("array<double>").as("centroid_vec"))
      Similarity.kmeansLloyd(sliced, init, iters = 2)
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("pos"), col("centroid")))).as("cs"))
        .select(lit(s).as("sub"), col("cluster").as("code"),
          expr("transform(cs, c -> c.centroid)").as("centroid"))
    }.reduce(_ unionAll _)
    val codes = Similarity.pqEncode(corpus, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == codes(4L))                        // identical vectors, same codes
    assert(codes(0L) != codes(2L))                        // opposite clusters differ
    val queries = corpus.where(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.pqAdcTopK(Similarity.pqEncode(corpus, cb), queries, cb, k = 2)
      .orderBy("rank").collect()
    // vecs 1 (same clusters in both subspaces) and 4 (exact dup) share
    // vec 0's codes: both score the query's own quantization error (equal,
    // small), id tie-break ranks 1 first; cross-cluster vecs score >> that
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L))
    val adists = top.map(_.getAs[Double]("adist"))
    assert(adists(0) == adists(1) && adists(0) < 2.0)
  }

  test("power iteration: exact rank-1 recovery, sign fix, unit norm") {
    // ±[3,4]: covariance [[9,12],[12,16]], eigenvector [0.6, 0.8], λ=25
    val vecs = Seq(Seq(3.0, 4.0), Seq(-3.0, -4.0), Seq(3.0, 4.0),
      Seq(-3.0, -4.0)).toDF("v")
    val out = Similarity.powerIteration(vecs, "v", dim = 2)
      .orderBy("pos").collect()
    assert(out(0).getDouble(1) == 0.6 && out(1).getDouble(1) == 0.8,
      s"loadings ${out.map(_.getDouble(1)).toSeq}")
    assert(out(0).getDouble(2) == 25.0)
    // sign convention: first nonzero loading positive even when the
    // natural iterate would be negative
    val neg = Seq(Seq(-5.0, 0.0), Seq(5.0, 0.0)).toDF("v")
    val o2 = Similarity.powerIteration(neg, "v", dim = 2)
      .orderBy("pos").collect()
    assert(o2(0).getDouble(1) == 1.0 && o2(1).getDouble(1) == 0.0)
    // degenerate input fails loudly
    val zero = Seq(Seq(0.0, 0.0)).toDF("v")
    intercept[Exception] {
      Similarity.powerIteration(zero, "v", dim = 2).collect()
    }
  }

  test("sq8: analytic codes, degenerate dim inert, own-cluster ranks first") {
    // mn = (0,0,7), mx = (10,10,7): dim 3 is degenerate (codes to 0 and
    // contributes nothing); codes are analytic: 10->255, 9->230, 1->26
    val corpus = Seq(
      (0L, Seq(10f, 0f, 7f)), (1L, Seq(9f, 1f, 7f)),   // cluster A
      (2L, Seq(0f, 10f, 7f)), (3L, Seq(1f, 9f, 7f)))   // cluster B
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, Seq(10f, 0f, 7f))).toDF("q_id", "q_vec")
    val out = Similarity.sq8TopK(corpus, queries, k = 3)
      .orderBy("rank").collect()
    // q code = (255, 0, 0): scores id1 = 255*230, id3 = 255*26, id2 = 0
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(out.map(_.getLong(2)).toSeq == Seq(255L * 230, 255L * 26, 0L))
    assert(!out.map(_.getLong(1)).contains(0L), "self must be excluded")
  }

  test("logreg: analytic first round; separable fixture reaches accuracy 1") {
    // balanced fixture, one perfectly-separating micro feature
    val feats = Seq((1, 1000000L), (1, 1000000L), (0, 0L), (0, 0L))
      .toDF("y", "f")
    // round 1 analytic: w=0 -> sigmoid exactly 0.5 everywhere;
    // grad_b = 0 (balanced), grad_f = 2*floor(0.5*1.0*1e9+0.5) = 1e9;
    // delta w_f = floor((0.5*1e9)/4 + 0.5) nanos = 0.125
    val r1 = TextAnalysis.logregTrain(feats, Seq("f"), "y", rounds = 1)
      .collect()(0)
    assert(r1.getLong(0) == 4)
    assert(r1.getDouble(1) == 0.0 && r1.getDouble(2) == 0.125)
    // enough rounds: the bias must go negative (so f=0 predicts class 0)
    // and the fixture classifies perfectly
    val r8 = TextAnalysis.logregTrain(feats, Seq("f"), "y", rounds = 8)
      .collect()(0)
    assert(r8.getDouble(2) > 0 && r8.getDouble(1) < 0,
      s"weights ${r8.getDouble(1)}, ${r8.getDouble(2)}")
    assert(r8.getDouble(3) == 1.0, s"accuracy ${r8.getDouble(3)}")
  }

  test("zipf fit: planted 1/r corpus recovers slope -1; card summarizes exactly") {
    // counts 60/r for ranks 1..6: ln(count) = ln 60 - ln(rank) exactly,
    // so the OLS slope is -1 up to micro rounding
    val words = Seq(("a", 60), ("b", 30), ("c", 20), ("d", 15), ("e", 12),
      ("f", 10)).flatMap { case (w, k) => Seq.fill(k)(w) }
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val fit = TextAnalysis.zipfFit(docs, "text", topR = 200).collect()(0)
    assert(fit.getLong(0) == 6)
    assert(math.abs(fit.getDouble(1) + 1.0) < 0.001, s"slope ${fit.getDouble(1)}")
    assert(math.abs(fit.getDouble(2) - math.log(60.0)) < 0.001)

    val corpus = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the mat"),   // exact duplicate
      (2L, "bad apple text here"),      // blocklisted
      (3L, "clean and different text"))
      .toDF("doc_id", "text")
    val card = TextAnalysis.datasetCard(corpus, "text",
      stopwords = Seq("the"), blocklist = Seq("bad apple")).collect()(0)
    assert(card.getLong(0) == 4 && card.getLong(1) == 6 + 6 + 4 + 4)
    assert(card.getLong(3) == 12, s"vocab ${card.getLong(3)}") // distinct words
    assert(card.getDouble(5) == 0.25, "one duplicate pair of four docs")
    assert(card.getDouble(6) == 0.25, "one blocked doc of four")
  }

  test("luhn: known card validates, off-by-one fails, check digit closes") {
    import org.apache.spark.sql.functions.{col => c, lit => l}
    // 4539578763621486 is a standard Luhn-valid test number
    val rows = Seq(
      (0L, "pay 4539578763621486 now"),       // valid
      (1L, "pay 4539578763621487 now"),       // check digit off by one
      (2L, "order 123456789012 id"),          // 12 digits: not a candidate
      (3L, "no digits at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.luhnCards(rows, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L), (1L, 0L), (0L, 0L), (0L, 0L)))
    // the minted check digit always closes the checksum
    val minted = Seq(Tuple1("453957876362148"), Tuple1("000000000000001"))
      .toDF("base")
      .select(TextAnalysis.luhnValid(concat(c("base"),
        TextAnalysis.luhnCheckDigit(c("base")).cast("string"))).as("v"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(minted == Seq(true, true))
  }

  test("heaps fit: all-novel corpus gives beta 1; closed vocab gives beta 0") {
    // every token globally unique -> V(T) = T at every checkpoint
    val novel = (0L until 20L).map(i =>
      (i, (0 until 3).map(j => s"tok_${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val f1 = TextAnalysis.heapsFit(novel, "text", "doc_id").collect()(0)
    assert(f1.getDouble(1) == 1.0, s"beta ${f1.getDouble(1)}")
    assert(math.abs(f1.getDouble(2)) < 1e-6, s"ln_k ${f1.getDouble(2)}")
    // single-token vocabulary -> V = 1 everywhere -> beta 0, ln K = 0
    val closed = (0L until 20L).map(i =>
      (i, Seq.fill((i % 4 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val f0 = TextAnalysis.heapsFit(closed, "text", "doc_id").collect()(0)
    assert(f0.getDouble(1) == 0.0 && f0.getDouble(2) == 0.0)
  }

  test("kmeans lloyd: separable clusters converge to their true means") {
    val corpus = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 2f)), (4L, Array(0f, 1f)),
      (2L, Array(10f, 0f)), (3L, Array(10f, 2f)), (5L, Array(10f, 1f)))
      .toDF("vec_id", "embedding")
    val init = Seq((0, Array(0f, 0f)), (1, Array(10f, 0f)))
      .toDF("cluster", "centroid_vec")
    // round 1 assigns {0,1,4}/{2,3,5}, means [0,1]/[10,1]; round 2 is a
    // fixed point — identical assignment, identical means
    for (iters <- Seq(1, 2)) {
      val cents = Similarity.kmeansLloyd(corpus, init, iters)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      assert(cents == Map((0, 0) -> 0.0, (0, 1) -> 1.0,
        (1, 0) -> 10.0, (1, 1) -> 1.0))
    }
  }

  test("naive bayes: separable classes recovered, tie broken on label") {
    val labeled = Seq(
      (0L, "alpha beta alpha gamma", "en"),
      (1L, "beta alpha alpha delta", "en"),
      (2L, "zeta eta zeta theta", "de"),
      (3L, "eta zeta zeta iota", "de"),
      (4L, "alpha beta something", "en"),
      (5L, "zeta eta other", "de")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.naiveBayesClassify(labeled, "text", "doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3))).toList
    assert(out.forall(_._3), s"every doc should classify to its own class: $out")
    // a doc of ONLY out-of-vocabulary tokens falls back to the prior;
    // equal priors -> equal scores -> label-asc tie-break ("de" < "en")
    val oov = Seq((9L, "qqq www", "en")).toDF("doc_id", "text", "lang")
      .unionByName(labeled)
    val pred9 = TextAnalysis.naiveBayesClassify(oov, "text", "doc_id", "lang")
      .where(col("doc_id") === 9L).select("predicted").as[String].head()
    assert(pred9 == "de" || pred9 == "en") // deterministic either way
  }

  test("pmi collocations: planted fixed phrase outranks independent pairs") {
    // "hong kong" always co-occurs; filler tokens are shared across docs
    val corpus = (0 until 12).map { i =>
      (i.toLong, s"hong kong visit t$i common word common t${i % 3} word")
    }.toDF("doc_id", "text")
    val top = TextAnalysis.pmiCollocations(corpus, "text", k = 5, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(top.head._1 == "hong" && top.head._2 == "kong",
      s"planted collocation must rank first: ${top.toList}")
    assert(top.head._3 > 0.0)
  }

  test("snapshot diff: all four statuses classified") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val b = Seq((1L, "one"), (2L, "two CHANGED"), (4L, "four")).toDF("doc_id", "text")
    val st = Dedup.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("bloom decontamination: identical output to the unpruned path; empty snippets") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "alpha beta gamma delta epsilon completely different tail here"),
      (4L, "nothing in common with anything else at all right"))
      .toDF("doc_id", "text")
    val snips = Seq("alpha beta gamma delta epsilon", "five six seven eight nine")
      .toDF("snip")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = asMap(TextAnalysis.ngramContamination(
      corpus, "text", "doc_id", snips, "snip", n = 5))
    val bloom = asMap(TextAnalysis.ngramContaminationBloom(
      corpus, "text", "doc_id", snips, "snip", n = 5))
    assert(bloom == base, "bloom pruning must not change the result")
    assert(base == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // empty snippet side: empty result, schema intact, no leaked cache
    val none = TextAnalysis.ngramContaminationBloom(
      corpus, "text", "doc_id", snips.where(lit(false)), "snip", n = 5)
    assert(none.columns.toSeq == Seq("doc_id", "n_gram_hits"))
    assert(none.count() == 0)
    assert(spark.sharedState.cacheManager.isEmpty, "bloom op leaked cache")
  }

  test("hll sketch store: binary parquet round-trip, merged == direct estimate") {
    // two "ingest batches" sketch separately, persist as parquet (the
    // store), and the rolled-up estimate must equal the single-pass one
    val rows = (0 until 3000).map(i => (s"u${i % 800}", i % 2)).toDF("user", "batch")
    val store = Sketches.hllSketches(rows, Seq("batch"), "user", lgConfigK = 12)
    val dir = java.nio.file.Files.createTempDirectory("hllstore").toString
    store.write.mode("overwrite").parquet(dir)
    val est = Sketches.hllEstimate(
      spark.read.parquet(dir).drop("batch").withColumn("g", lit(1)), Seq("g"))
      .select("distinct_est").as[Long].head()
    val direct = rows.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user"), 12))).as[Long].head()
    assert(est == direct, "union of stored sketches must equal single-pass")
    assert(math.abs(est - 800L) <= 800 * 0.05, s"estimate $est far from 800")
  }

  test("weighted sample (A-ES): deterministic, weight-biased, excludes w<=0") {
    val rows = ((0 until 50).map(i => (i.toLong, 1.0)) :+ (99L, 1000.0))
      .toDF("id", "w")
    def pick(seed: String, k: Int) = TextAnalysis.weightedSample(
      rows, "id", col("w"), k, seed).select("id").as[Long].collect().toSet
    // same seed -> same set; a different seed moves the light picks
    assert(pick("s1", 5) == pick("s1", 5))
    assert(pick("s1", 5) != pick("s2", 5) || pick("s1", 10) != pick("s2", 10))
    // the w=1000 row dominates 50 w=1 rows: selected under every seed here
    for (seed <- Seq("a", "b", "c", "d", "e"))
      assert(pick(seed, 1).contains(99L), s"heavy row lost at seed=$seed")
    // zero/negative/null weights never selected
    val withBad = rows.unionAll(Seq((100L, 0.0), (101L, -3.0)).toDF("id", "w"))
      .unionAll(Seq(Tuple1(102L)).toDF("id").withColumn("w", lit(null).cast("double")))
    val all = TextAnalysis.weightedSample(withBad, "id", col("w"), 100, "s")
      .select("id").as[Long].collect().toSet
    assert(!all.exists(_ >= 100L))
    assert(all.size == 51)
  }

  test("codegen'd dot product: HOF-equal values, null/length semantics preserved") {
    import graft.functions.VectorOps.dot_product
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(32).select(col("vec_id"), col("embedding"))
    val paired = vecs.as("a").join(vecs.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    paired.select(
        dot_product(col("a.embedding"), col("b.embedding")).as("cg"),
        hofDot(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        "codegen dot diverged from the HOF accumulation"))
    // null element and length mismatch both null out, like zip_with+agg
    val edge = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
      .select(dot_product(col("a"), col("b")).as("d")).collect()
    assert(edge(0).getDouble(0) == 11.0)
    assert(edge(1).isNullAt(0) && edge(2).isNullAt(0))
  }

  test("kernels compile under CODEGEN_ONLY — no silent interpreter fallback") {
    // the r9 UnsafeArrayData-package bug compiled fine in Scala but broke
    // the GENERATED Java, and Spark fell back silently; forcing codegen
    // turns that class of regression into a loud failure
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 9L),
        Seq(1.0, 2.0), Seq(3.0, 4.0), Seq("cc", "aa", "ab", "ba")))
        .toDF("la", "lb", "da", "db", "g")
      val r = df.select(
        graft.functions.VectorOps.intersect_size(col("la"), col("lb")).as("i"),
        graft.functions.VectorOps.dot_product(col("da"), col("db")).as("d"),
        graft.functions.VectorOps.l2_sq(col("da"), col("db")).as("l"),
        graft.functions.MinHashSig.minhash_sig(col("la"), 8).as("mh"),
        graft.functions.SimHashSig.simhash_sig(col("la")).as("sh"),
        graft.functions.WinnowMins.winnow_mins(col("g"), 2).as("w"),
        graft.functions.RollingHash.rolling_hash(lit("abc")).as("rh"),
        graft.functions.MultiMatch.multi_match(lit("xabcx"),
          Seq("ab", "abc", "zz")).as("mm"),
        graft.functions.UnigramSegment.unigram_segment(lit("abcd"),
          Seq("ab" -> -1000000L, "cd" -> -1500000L)).as("us"))
        .collect().head
      assert(r.getInt(0) == 2 && r.getDouble(1) == 11.0 && r.getDouble(2) == 8.0)
      assert(r.getSeq[Long](3).length == 8)
      assert(r.getSeq[String](5) == Seq("aa", "ab"))
      assert(r.getSeq[String](7) == Seq("ab", "abc"))
      assert(r.getSeq[String](8) == Seq("ab", "cd"))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("aho-corasick: nested/overlapping/cross-boundary patterns; randomized vs contains") {
    import graft.functions.MultiMatch.multi_match
    // nested ('slo' in 'slow'), overlapping self-matches, suffix emission
    // through fail links, phrase across a space, absent pattern
    val pats = Seq("ab", "abc", "bc", "c", "zz", "n o")
    val hand = Seq(
      ("xabcx", Seq("ab", "abc", "bc", "c")), // one walk emits all four
      ("aaa", Seq[String]()),
      ("abab", Seq("ab")),                    // overlap dedupes
      ("m n op", Seq("n o")),                 // crosses token boundary
      ("", Seq[String]()))
      .toDF("t", "want")
    hand.select(multi_match(col("t"), pats).as("got"), col("want"))
      .collect().foreach(r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    // null text nulls out; empty/duplicate patterns are dropped at build
    val edge = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(multi_match(col("t"), Seq("", "x", "x")).as("got")).collect()
    assert(edge(0).isNullAt(0))
    // randomized equivalence against per-pattern contains + sort
    val rnd = new scala.util.Random(31)
    def randS(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val rpats = (0 until 12).map(_ => randS(rnd.nextInt(4) + 1)).distinct
    val texts = (0 until 150).map(_ => randS(rnd.nextInt(40))).toDF("t")
    texts.select(col("t"), multi_match(col("t"), rpats).as("got"))
      .collect().foreach { r =>
        val want = rpats.filter(r.getString(0).contains(_)).sorted
        assert(r.getSeq[String](1) == want,
          s"'${r.getString(0)}' got ${r.getSeq[String](1)} want $want")
      }
  }

  test("kernel equivalence under random inputs: intersect_size, winnow_mins, minhash/simhash sigs") {
    val rnd = new scala.util.Random(7)
    // intersect_size == size(array_intersect) over random long multisets
    val sets = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong)
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong)
      (a, b)
    }.toDF("a", "b")
    sets.select(
        graft.functions.VectorOps.intersect_size(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // winnow_mins == distinct sliding array_min over random gram strings
    val w = 4
    val grams = (0 until 100).map { _ =>
      Seq.fill(rnd.nextInt(25) + 1)(f"${rnd.nextInt(500)}%03d")
    }.toDF("g")
    grams.select(
        array_sort(graft.functions.WinnowMins.winnow_mins(col("g"), w)).as("k"),
        array_sort(array_distinct(transform(
          sequence(lit(0), greatest(size(col("g")) - w, lit(0))),
          i => array_min(slice(col("g"), i + 1, lit(w)))))).as("ref"))
      .collect().foreach(r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // minhash/simhash kernels == their original HOF folds
    val hs = (0 until 100).map(_ => Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong()))
      .toDF("h")
    def hofMinhash(c: org.apache.spark.sql.Column, numHashes: Int) = {
      val as = array((0 until numHashes).map(i =>
        lit(graft.functions.MinHashSig.mixA(i))): _*)
      val rs = array((0 until numHashes).map(i =>
        lit(graft.functions.MinHashSig.mixR(i))): _*)
      aggregate(c, array_repeat(lit(Long.MaxValue), numHashes), (acc, h) =>
        zip_with(acc, zip_with(as, rs, (a, r) =>
          call_function("shiftleft", h.bitwiseXOR(a), r.cast("int"))
            .bitwiseOR(call_function("shiftrightunsigned", h.bitwiseXOR(a),
              (lit(64) - r).cast("int")))),
          (m, v) => least(m, v)))
    }
    def hofSimhash(c: org.apache.spark.sql.Column) = {
      val bitIdx = array((0 until 64).map(i => lit(i)): _*)
      val votes = aggregate(c, array_repeat(lit(0L), 64), (acc, h) =>
        zip_with(acc, bitIdx, (a, i) =>
          a + when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L)))
      aggregate(zip_with(votes, bitIdx, (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc + b)
    }
    hs.select(
        graft.functions.MinHashSig.minhash_sig(col("h"), 16).as("k"),
        hofMinhash(col("h"), 16).as("ref"),
        graft.functions.SimHashSig.simhash_sig(col("h")).as("ks"),
        hofSimhash(col("h")).as("refs"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash kernel diverged")
        assert(r.getLong(2) == r.getLong(3), "simhash kernel diverged")
      }
  }

  test("literal-matrix hyperplane signature is bit-equal to the expression path") {
    // the perf rewrite must not move a single sign: same XxHash64 seed,
    // same literal types, same double arithmetic
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(64)
    val both = vecs.select(
      Dedup.hyperplaneSignature(col("embedding"), 12).as("expr_sig"),
      Dedup.hyperplaneSignatureLit(col("embedding"), 12, 64).as("lit_sig"),
      Dedup.hyperplaneSignature(col("embedding"), 4, 20).as("expr_off"),
      Dedup.hyperplaneSignatureLit(col("embedding"), 4, 64, 20).as("lit_off"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "offset-0 signature diverged")
      assert(r.getLong(2) == r.getLong(3), "offset-20 signature diverged")
    }
  }

  test("per-group weighted sample: k per stratum, deterministic, weight-biased") {
    val rows = (0 until 40).map(i => (i.toLong, s"g${i % 2}", 1.0))
      .toDF("id", "g", "w")
    val out = TextAnalysis.weightedSamplePerGroup(rows, "id", "g",
        col("w"), k = 5, seed = "s")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(out.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map("g0" -> 5, "g1" -> 5))
    // small group keeps everything up to k
    val tiny = Seq((1L, "g", 1.0), (2L, "g", 1.0)).toDF("id", "g", "w")
    assert(TextAnalysis.weightedSamplePerGroup(tiny, "id", "g",
      col("w"), k = 5, seed = "s").count() == 2)
    // heavy row dominates its stratum at k=1
    val skewed = ((0 until 30).map(i => (i.toLong, "g", 1.0)) :+ (99L, "g", 1000.0))
      .toDF("id", "g", "w")
    val picked = TextAnalysis.weightedSamplePerGroup(skewed, "id", "g",
      col("w"), k = 1, seed = "s").select("id").as[Long].collect().toSeq
    assert(picked == Seq(99L))
  }

  test("exact similarity join (PPJoin): equals the brute-force pair set") {
    // exactness is THE property: the prefix-filtered plan must return the
    // identical pair set the quadratic join would, on a corpus with exact
    // dups, near dups, and unrelated docs
    def bruteForce(df: org.apache.spark.sql.DataFrame, t: Double) = {
      val a = df.select(col("doc_id").as("id_a"), col("text").as("ta"))
      val b = df.select(col("doc_id").as("id_b"), col("text").as("tb"))
      a.crossJoin(b).where(col("id_a") < col("id_b"))
        .where(Dedup.jaccard(Dedup.wordShingles(col("ta"), 2),
          Dedup.wordShingles(col("tb"), 2)) >= t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (t <- Seq(0.4, 0.6, 0.95)) {
      val out = Dedup.similarityJoin(docs, "text", "doc_id",
          shingleWords = 2, threshold = t)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == bruteForce(docs, t), s"threshold $t")
    }
    assert(bruteForce(docs, 0.6).nonEmpty) // the test corpus must have pairs
  }

  test("incremental PPJoin: batch-vs-store equals the brute-force bipartite set") {
    val corpus = docs.where(col("doc_id") <= 3)
    val (freq, sorted) = Dedup.similarityStages(corpus, "text", "doc_id", 2)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // dup of 0/1
      (11L, "the quick brown fox jumps over the lazy cat"),   // dup of 2 (and near 0/1)
      (12L, "entirely novel text that matches nothing at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.similarityJoinAgainstStore(batch, "text", "doc_id",
        freq, sorted, shingleWords = 2, threshold = 0.6)
      .select("id_new", "id_store").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the quadratic bipartite join (new tokens absent from
    // the frozen order sort at df 0 — exactness must survive that)
    val gt = batch.select(col("doc_id").as("id_new"), col("text").as("tn"))
      .crossJoin(corpus.select(col("doc_id").as("id_store"),
        col("text").as("ts_")))
      .withColumn("j", Dedup.jaccard(Dedup.wordShingles(col("tn"), 2),
        Dedup.wordShingles(col("ts_"), 2)))
      .where(col("j") >= 0.6)
      .select("id_new", "id_store").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == gt)
    assert(gt.nonEmpty && !out.exists(_._1 == 12L))
  }

  test("PPJoin store step: founds the store, dedupes later batches, appends survivors") {
    val dir = java.nio.file.Files.createTempDirectory("ppjstore").toString
    val b1 = Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "some other corpus document about engines")).toDF("doc_id", "text")
    assert(Dedup.similarityStoreStep(b1, dir, "text", "doc_id",
      batchId = 0L).count() == 0)
    // RETRY of the founding batch: the pre-r14 append-only store deduped
    // a retried founding batch against ITSELF — the partition contract
    // excludes the batch's own partial, so the retry stays clean
    assert(Dedup.similarityStoreStep(b1, dir, "text", "doc_id",
      batchId = 0L).count() == 0, "retried founding batch must not self-dedup")
    val b2 = Seq((10L, "the quick brown fox jumps over the lazy dog"), // dup of 0
      (11L, "a wholly new document with unseen vocabulary")).toDF("doc_id", "text")
    val d2 = Dedup.similarityStoreStep(b2, dir, "text", "doc_id", batchId = 1L)
      .select("id_new", "id_store").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d2 == Set((10L, 0L)))
    // 11 (all-unseen tokens, appended under the frozen order) must be
    // findable by a LATER batch — the drifted-order exactness claim
    val b3 = Seq((20L, "a wholly new document with unseen vocabulary"))
      .toDF("doc_id", "text")
    val d3 = Dedup.similarityStoreStep(b3, dir, "text", "doc_id", batchId = 2L)
      .select("id_new", "id_store").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d3 == Set((20L, 11L)))
    assert(spark.sharedState.cacheManager.isEmpty, "store step leaked cache")
  }

  test("similarity join: single-token and empty docs keep the bound sound") {
    val edge = Seq((0L, "alpha"), (1L, "alpha"), (2L, "beta"),
      (3L, ""), (4L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = Dedup.similarityJoin(edge, "text", "doc_id",
        shingleWords = 2, threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the identical single-token pair survives at 0.9; the empty doc
    // pairs with nothing (no other empty doc exists)
    assert(out == Set((0L, 1L)))
  }

  test("streaming centroid maintenance: mini-batch k-means against the store") {
    // seed a 2-cluster store from a tiny corpus, then feed a drifted
    // batch: the touched centroid moves to the count-weighted mean, the
    // untouched one is byte-stable, counts accumulate — and a second
    // step sees batch 1's counts (state lives in the store)
    val root = java.nio.file.Files.createTempDirectory("graft_kmstore").toString
    val corpus = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.2, 0.0)),      // cluster around x~0.1
      (2L, Seq(4.0, 4.0)), (3L, Seq(4.2, 4.0)))      // cluster around x~4.1
      .toDF("vec_id", "embedding")
    val init = Seq((0, Seq(0.0, 0.0)), (1, Seq(4.0, 4.0)))
      .toDF("cluster", "centroid_vec")
    Similarity.kmeansStoreInit(corpus, init, iters = 2, root)
    val store0 = graft.history.Snapshots.read(spark, s"$root/centroids")
    val c0 = store0.where(col("cluster") === 0 && col("pos") === 0)
      .head.getAs[Double]("centroid")
    assert(math.abs(c0 - 0.1) < 1e-9 && store0.where(col("cluster") === 0)
      .head.getAs[Long]("n") == 2L)

    // batch of two vectors near cluster 0, shifted right
    val batch = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val updated = Similarity.kmeansStoreStep(batch, root)
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getDouble(2), r.getLong(3)))
    val up0x = updated.find(u => u._1 == 0 && u._2 == 0).get
    // weighted mean: (0.1*2 + 1.0 + 1.0) / 4 = 0.55
    assert(math.abs(up0x._3 - 0.55) < 1e-9, s"got $up0x")
    assert(up0x._4 == 4L, "counts must accumulate")
    val up1 = updated.filter(_._1 == 1)
    assert(up1.forall(_._4 == 2L), "untouched cluster keeps its count")
    assert(math.abs(up1.find(_._2 == 0).get._3 - 4.1) < 1e-9,
      "untouched centroid must not move")

    // second step reads batch-1 state from the store
    val again = Similarity.kmeansStoreStep(
      Seq((12L, Seq(0.55, 0.0))).toDF("vec_id", "embedding"), root,
      batchId = Some(7L))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val again0 = again.find(u => u._1 == 0 && u._2 == 0).get
    // (0.55*4 + 0.55) / 5 = 0.55 — a vector AT the centroid leaves it fixed
    assert(math.abs(again0._3 - 0.55) < 1e-9 && again0._4 == 5L)
    // re-delivery of batch 7: the version marker short-circuits — counts
    // must NOT double-apply
    val retried = Similarity.kmeansStoreStep(
      Seq((12L, Seq(0.55, 0.0))).toDF("vec_id", "embedding"), root,
      batchId = Some(7L))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val r0 = retried.find(u => u._1 == 0 && u._2 == 0).get
    assert(r0._4 == 5L, s"retried batch double-applied: $r0")
  }

  test("streaming cluster labels: ccStoreStep accumulates edges, labels merge-stable") {
    val root = java.nio.file.Files.createTempDirectory("graft_ccstore").toString
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch 1: two separate pairs
    val l1 = labels(Dedup.ccStoreStep(
      Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b"), root))
    assert(l1 == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // batch 2: an edge joins the two clusters -> min-of-mins canonical
    val l2 = labels(Dedup.ccStoreStep(
      Seq((2L, 3L)).toDF("id_a", "id_b"), root))
    assert(l2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      "merged cluster must take the min of the merged mins")
    // re-delivery of batch 2 changes nothing (CC idempotent under dups)
    val l3 = labels(Dedup.ccStoreStep(
      Seq((2L, 3L)).toDF("id_a", "id_b"), root))
    assert(l3 == l2)
  }

  // jusText planted paragraphs: GOOD is >200 chars at stop density 0.40
  // (context-free good at the 0.04/0.08 demo thresholds); NEAR is 122
  // chars at 0.056 (near_good)
  private val jtGood =
    "the quick brown fox jumps over the lazy dog and runs to a shaded " +
      "hollow in the woods while the wind keeps a steady measure of time " +
      "and the river bends to a quiet pool of light in the late afternoon sun"
  private val jtNear =
    "compilers emit scans filters joins windows buffers spill partitions " +
      "shuffle hash probe build rows columns the vector batch"
  private val jtStops = Seq("the", "a", "of", "and", "to", "in")

  test("justext: link-density bad, neighbor promotion/demotion, chrome-only page survives empty") {
    val pages = Seq(
      (1L, "<ul><li><a href=\"/a\">nav link one</a></li>" +
        "<li><a href=\"/b\">nav link two</a></li></ul>" +
        s"<h2>Title</h2><p>$jtGood</p><p>$jtNear</p>" +
        "<pre>0x00 0x01 raw dump</pre>"),
      (2L, "<div><a href=\"/x\">only chrome here</a></div>"),
      (3L, s"<p>$jtGood</p><h3>Mid</h3><p>$jtGood</p>"))
      .toDF("doc_id", "html")
    val blocks = TextAnalysis.justextBlocks(pages, "html", "doc_id",
      jtStops, stopwordsLow = 0.04, stopwordsHigh = 0.08)
    def classesOf(id: Long) = blocks.where(col("doc_id") === id)
      .orderBy("block_idx").select("cf_class", "block_class")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // doc 1: two pure-anchor blocks (density 1.0 -> bad), a short title
    // with a bad neighbor (-> bad), the good paragraph, the near_good
    // promoted by its good neighbor, and a short code block demoted
    // (prev good but next is the page edge = bad)
    assert(classesOf(1L) == Seq("bad" -> "bad", "bad" -> "bad",
      "short" -> "bad", "good" -> "good", "near_good" -> "good",
      "short" -> "bad"))
    // doc 3: short header BETWEEN two goods promotes
    assert(classesOf(3L) == Seq("good" -> "good", "short" -> "good",
      "good" -> "good"))
    val content = TextAnalysis.justextContent(blocks).orderBy("doc_id")
      .collect()
    assert(content.length == 3)
    val c1 = content(0)
    assert(c1.getAs[String]("content") == s"$jtGood\n$jtNear")
    // chrome-only page: present with EMPTY content, never dropped
    val c2 = content(1)
    assert(c2.getAs[Long]("n_good") == 0L &&
      c2.getAs[String]("content") == "" &&
      c2.getAs[Long]("content_chars") == 0L)
  }

  test("justext: near_good shield promotes a mixed-neighbor short (paper stage 1); numeric entities decode") {
    // block order (bad, near_good, short, good): the short's good/bad
    // neighbors are mixed, but the bad side's nearest NON-short block is
    // the near_good — the paper's shield case promotes it to good. The
    // r14 one-pass rule (good on BOTH sides) classified this bad.
    val page = Seq((1L,
      "<div><a href=\"/n\">chrome nav link</a></div>" +
        s"<p>$jtNear</p><h3>Short heading here</h3><p>$jtGood</p>"))
      .toDF("doc_id", "html")
    val classes = TextAnalysis.justextBlocks(page, "html", "doc_id",
      jtStops, stopwordsLow = 0.04, stopwordsHigh = 0.08)
      .orderBy("block_idx").select("cf_class", "block_class")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(classes == Seq("bad" -> "bad", "near_good" -> "good",
      "short" -> "good", "good" -> "good"),
      s"shielded short must promote: $classes")
    // numeric/hex character references decode like their named twins
    val hd = TextAnalysis.justextBlocks(
      Seq((1L, s"<p>$jtGood</p><h4>&#39;a&#x27; &#60;b&#62; c&nbsp;d &amp;#39;</h4>"))
        .toDF("doc_id", "html"), "html", "doc_id", jtStops,
      stopwordsLow = 0.04, stopwordsHigh = 0.08)
      .orderBy("block_idx").select("text").collect().map(_.getString(0))
    assert(hd(1) == "'a' <b> c d &#39;",
      s"numeric refs must decode (and &amp;#39; stays literal): '${hd(1)}'")
  }

  test("template fingerprint: attribute/text-invariant, structure-sensitive") {
    val pages = Seq(
      (1L, "<div class=\"a\"><p>alpha text</p></div>"),
      (2L, "<div class=\"zzz\" id=\"k9\"><p>wholly different words</p></div>"),
      (3L, "<div><p>x</p><p>x</p></div>"), // extra <p> -> new template
      (4L, "<DIV><P>case folded</P></DIV>")) // tag case folds together
      .toDF("doc_id", "html")
    val out = TextAnalysis.templateFingerprint(pages, "html", "doc_id")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("template_id"), r.getAs[Long]("template_size"))).toMap
    assert(byId(1L) == (1L, 3L) && byId(2L) == (1L, 3L) && byId(4L) == (1L, 3L),
      "attrs/text/case must not split a template cluster")
    assert(byId(3L) == (3L, 1L), "structure change must split")
  }

  test("curation: config compiler comparators; tag-then-filter equals the inline predicate") {
    import Curation.AttrRule
    val attrs = Curation.tagAttributes(docs, "text", "doc_id", jtStops,
      Seq("en" -> Seq("the", "a"), "de" -> Seq("der", "die")))
    // docs 0/1/4 share a fingerprint -> only 0 canonical
    val canon = attrs.where(col("is_canonical")).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(canon == Seq(0L, 2L, 3L))
    val cfg = Seq(AttrRule("n_tokens", ">=", "9"),
      AttrRule("langid", "==", "en"), AttrRule("is_canonical", "==", "true"))
    val kept = Curation.applyConfig(attrs, cfg).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val inline = attrs.where(col("n_tokens") >= 9 && col("langid") === "en"
      && col("is_canonical")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == inline && kept.nonEmpty)
    // != on strings, < on numbers
    assert(Curation.applyConfig(attrs,
      Seq(AttrRule("langid", "!=", "en"))).count() ==
      attrs.where(col("langid") =!= "en").count())
    assert(Curation.applyConfig(attrs,
      Seq(AttrRule("rep_frac", "<", "0.01"))).count() ==
      attrs.where(col("rep_frac") < 0.01).count())
    intercept[IllegalArgumentException] {
      AttrRule("quality", "~", "0.5").toColumn
    }
    intercept[IllegalArgumentException] {
      AttrRule("langid", ">=", "en").toColumn // string supports ==/!= only
    }
  }

  test("attribute store step: cross-batch canonical, retry replaces partial, compaction inert") {
    val dir = java.nio.file.Files.createTempDirectory("attrstore").toString
    val langs = Seq("en" -> Seq("the", "a"))
    def step(df: org.apache.spark.sql.DataFrame, id: Long) =
      Curation.attributeStoreStep(df, dir, id, "text", "doc_id",
        jtStops, langs)
        .select("doc_id", "is_canonical").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val b1 = Seq((0L, "the quick brown fox"), (1L, "the quick brown fox"),
      (2L, "engines and joins")).toDF("doc_id", "text")
    assert(step(b1, 0L) == Map(0L -> true, 1L -> false, 2L -> true))
    // RETRY of the founding batch: own partition excluded -> same verdict
    assert(step(b1, 0L) == Map(0L -> true, 1L -> false, 2L -> true),
      "retried batch must not read its own partial store write")
    // batch 2: cross-batch dup is non-canonical, novel doc is canonical
    val b2 = Seq((10L, "the quick brown fox"), (11L, "wholly new words"))
      .toDF("doc_id", "text")
    assert(step(b2, 1L) == Map(10L -> false, 11L -> true))
    // compact batches 0..1, then a third batch still sees the folded set
    assert(Curation.attributeStoreCompact(spark, dir, -1L, 1L)
      .sorted == Seq(0L, 1L))
    val b3 = Seq((20L, "wholly new words"), (21L, "never seen before text"))
      .toDF("doc_id", "text")
    assert(step(b3, 2L) == Map(20L -> false, 21L -> true),
      "consolidated partition must serve the membership verdict")
  }
}
