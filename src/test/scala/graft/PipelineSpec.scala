package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: dedup fidelity, similarity
  * search correctness, text heuristics. */
class PipelineSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near-dup of 0
    (2L, "completely different content about spark query engines and optimizers"),
    (3L, "the quick brown fox jumps over the lazy dog and runs away fast") // exact dup of 0
  ).toDF("doc_id", "text")

  test("HLL sketch distinct-count tracks the exact vocabulary within 5%") {
    val tokens = SparkSpec.session.range(200000)
      .select(concat(lit("tok"), pmod(xxhash64(col("id")), lit(50000))).as("w"))
    val row = tokens.agg(
      count_distinct(col("w")).as("exact"),
      approx_count_distinct(col("w"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("multi-probe IVF recovers a neighbor the single-probe scan misses") {
    import org.apache.spark.sql.DataFrame
    // EXPLICIT centroids on two orthogonal directions (ivfTopKWith
    // takes any prebuilt index): query q assigns to cell A but sits
    // near B too — its cell-B neighbors are invisible at nProbe=1
    // and reachable at nProbe=2
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // cell A
      (1L, Array(0f, 1f, 0f, 0f)),      // cell B
      (2L, Array(0.8f, 0.6f, 0f, 0f)),  // q: argmax dot → cell A
      (3L, Array(0.1f, 0.995f, 0f, 0f)) // cell B
    ).toDF("vec_id", "embedding")
    val cents = Array((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f)))
    def neighbors(nProbe: Int): Set[Long] =
      Similarity.ivfTopKWith(vecs.filter($"vec_id" === 2), vecs,
        "vec_id", "embedding", k = 3, cents, nProbe = nProbe)
        .collect().map(_.getLong(2)).toSet
    val single = neighbors(1)
    val multi = neighbors(2)
    assert(single.subsetOf(multi))
    // with both cells probed, EVERY other vector is reachable
    assert(multi == Set(0L, 1L, 3L), s"multi $multi")
    assert(single.size < multi.size, s"single $single should miss a cell")
  }

  test("semDedup: duplicates cluster together, lowest id is the kept representative") {
    // 0,1,2 are exactly parallel (cos = 1, and scaling preserves the
    // argmax cell for ANY sampled centroid set); 3 is orthogonal to
    // them (cos = 0 < τ wherever it lands)
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)), // exact dup of 0
      (2L, Array(2f, 0f, 0f, 0f)), // parallel (cos 1) with 0
      (3L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(emb, "vec_id", "embedding", nClusters = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 4)
    assert(!out(0L)._2 && out(1L)._2 && out(2L)._2 && !out(3L)._2)
    assert(out(0L)._1 == out(1L)._1 && out(1L)._1 == out(2L)._1)
  }

  test("kmeansRefine recovers blob centers from arbitrary member inits") {
    import org.apache.spark.sql.functions.{transform => sqlTransform}
    // two tight blobs on orthogonal directions; noise in [0, 0.1)
    val vecs = SparkSpec.session.range(400).select($"id".as("vec_id"),
      sqlTransform(sequence(lit(0), lit(3)), i => (
        when(i === pmod($"id", lit(2)).cast("int"), lit(1.0)).otherwise(lit(0.0)) +
          pmod(xxhash64($"id" * 7 + i), lit(100)).cast("double") / 1000.0
        ).cast("float")).as("embedding"))
    // init: two members of the SAME blob (id 0 and 2 — both even/blob-0);
    // refinement must still separate the blobs
    val init = Array(
      (0, Array(1.05f, 0.02f, 0.01f, 0.03f)),
      (1, Array(0.95f, 0.08f, 0.05f, 0.01f)))
    val refined = Similarity.kmeansRefine(vecs, "embedding", init, iters = 3)
    // after refinement the two centroids point at DIFFERENT blobs:
    // exactly one has its max coordinate at dim 0, the other at dim 1
    val maxDims = refined.map(_._2.zipWithIndex.maxBy(_._1)._2).toSet
    assert(maxDims == Set(0, 1), s"maxDims $maxDims — centroids ${refined.map(_._2.mkString(","))}")
    // and the full assignment splits the corpus into the two parity blobs
    val assigned = vecs.withColumn("c",
      graft.operators.Dedup.clusterAssignAuto($"embedding", refined))
      .groupBy("c").count().collect().map(r => r.getLong(1)).sorted
    assert(assigned.toSeq == Seq(200L, 200L), s"sizes ${assigned.toSeq}")
  }

  test("pqCodebooksRefined cuts quantization error vs the sampled codebook") {
    import org.apache.spark.sql.functions.{transform => sqlTransform}
    val m = 4; val kc = 4; val dim = 16; val sub = dim / m
    val vecs = SparkSpec.session.range(256).select($"id".as("vec_id"),
      sqlTransform(sequence(lit(1), lit(dim)),
        i => (pmod(xxhash64($"id" * 13 + i), lit(1000)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("embedding"))
    val sampled = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m, kc)
    val refined = Similarity.pqCodebooksRefined(vecs, "vec_id", "embedding", m, kc, iters = 3)
    val data = vecs.collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    def quantError(cb: Array[Array[Array[Double]]]): Double =
      data.map { v =>
        (0 until m).map { mi =>
          val s = v.slice(mi * sub, (mi + 1) * sub)
          cb(mi).map(c => s.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    val (se, re) = (quantError(sampled), quantError(refined))
    assert(re < se, s"refined error $re should beat sampled $se")
  }

  test("cluster assignment: imperative kernel matches the column algebra bitwise") {
    import org.apache.spark.sql.functions.transform
    // 40 centroids forces the kernel on the auto path; compare it
    // against the small-set column algebra on the same centroids
    val vecs = SparkSpec.session.range(300).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(16)),
        i => (pmod(xxhash64($"id" * 31 + i), lit(2001)).cast("double") / 1000.0 - 1.0)
          .cast("float")).as("embedding"))
    val cents = graft.operators.Dedup.sampleCentroids(vecs, "vec_id", "embedding", 40)
    assert(cents.length == 40)
    val both = vecs
      .withColumn("alg", graft.operators.Dedup.clusterAssignCol($"embedding", cents))
      .withColumn("ker", graft.operators.Dedup.clusterAssignKernel(cents)($"embedding"))
      .filter($"alg" =!= $"ker")
    assert(both.count() == 0)
  }

  test("semDedup degenerate inputs: tiny and empty corpora behave") {
    val one = Seq((7L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    // nClusters far above corpus size: sample yields 1 centroid, no pairs
    val r = Dedup.semDedup(one, "vec_id", "embedding", nClusters = 16, tau = 0.9)
      .collect()
    assert(r.length == 1 && !r(0).getBoolean(2))
    val empty = one.filter($"vec_id" === -1L)
    assert(Dedup.semDedup(empty, "vec_id", "embedding", 16, 0.9).collect().isEmpty)
  }

  test("nearDupGroups finds connected components of candidate pairs") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,7}, singleton via no edges
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 7L)).toDF("a", "b")
    val groups = Dedup.nearDupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L && groups(9L) == 1L)
    assert(groups(5L) == 5L && groups(7L) == 5L)
    // keep policy: exactly one kept doc per component
    assert(groups.count { case (id, g) => id == g } == 2)
    // the distributed label-propagation fallback (threshold 0 forces
    // it) must produce the identical components
    val dist = Dedup.nearDupGroups(pairs, driverUnionFindThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == groups)
  }

  test("label-propagation fallback converges on a long-chain component (pointer jumping)") {
    // 60-node chain: diameter 59 exceeds maxRounds=20 one-hop rounds —
    // only the path-doubling shortcut converges it; assert it matches
    // the driver union-find on the same edges
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("a", "b")
    val uf = Dedup.nearDupGroups(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.nearDupGroups(chain, driverUnionFindThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == uf)
    assert(dist.size == 60 && dist.values.forall(_ == 0L))
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exactDedup(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 0L) // keep lowest id
  }

  test("minhash est_jaccard tracks true jaccard for near-dups") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", shingleSize = 3, numHashes = 64)
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id", numHashes = 64, rowsPerBand = 4)
    val verified = Dedup.jaccardVerify(pairs, docs, "doc_id", "text", 3)
      .select("a", "b", "est_jaccard", "jaccard").collect()
    // exact dup pair (0,3) must be found with jaccard 1.0
    val exact = verified.find(r => r.getLong(0) == 0L && r.getLong(1) == 3L)
    assert(exact.isDefined, "exact-dup pair not in candidates")
    assertClose(exact.get.getDouble(3), 1.0)
    assertClose(exact.get.getDouble(2), 1.0)
    // near-dup pair (0,1): true jaccard high, estimate within 0.25
    val near = verified.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(near.isDefined, "near-dup pair not in candidates")
    assert(math.abs(near.get.getDouble(2) - near.get.getDouble(3)) < 0.25)
  }

  test("simhash hamming distance: near-dups closer than unrelated docs") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(3L)) == 0)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
  }

  test("cosine top-k finds the nearest vector") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(emb.filter($"vec_id" === 0), emb, "vec_id", "embedding", 2)
      .orderBy("rnk").collect()
    assert(out(0).getLong(2) == 1L) // nearest
    assert(out(0).getDouble(3) > 0.99 * out(1).getDouble(3))
  }

  test("IVF ANN returns same top-1 as brute force when cells are coarse") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 7)
    val brute = Similarity.cosineTopK(q, vecs, "vec_id", "embedding", 1).collect()(0).getLong(2)
    val ivf = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", k = 1, nCells = 1).collect()(0).getLong(2)
    assert(brute == ivf)
  }

  test("langId picks the stopword-dominant language") {
    val d = Seq(
      (0L, "the cat and the dog sat in the garden of the house"),
      (1L, "der Hund und die Katze sind nicht mit der Maus"),
      (2L, "le chat et les chiens sont dans le jardin et les arbres"),
      (3L, "这是一个中文文档 关于数据处理")
    ).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en" && got(1L) == "de" && got(2L) == "fr" && got(3L) == "zh")
  }

  test("token count and fingerprint invariance to formatting") {
    val d = Seq((0L, "Hello,  World! This is   a test."), (1L, "hello world this is a test")).toDF("doc_id", "text")
    val fp = d.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1)) // punctuation/casing/whitespace-insensitive
    val tc = d.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(tc.toSeq == Seq(6, 6))
  }

  test("PQ codes are m small ints; ADC ranking finds the planted cluster") {
    // 40 vectors in 4 tight clusters of 10 (cluster centers far apart,
    // small deterministic jitter): PQ with a sampled codebook must
    // put a query's own-cluster members ahead of other clusters
    val vecs = SparkSpec.session.range(40).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), i =>
        ((col("id") % 4) * 100.0 +
          pmod(xxhash64(col("id"), i), lit(17)).cast("double") / 17.0).cast("float"))
        .as("embedding"))
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m = 4, k = 8)
    assert(cb.length == 4 && cb(0).length == 8 && cb(0)(0).length == 16)
    val codes = Similarity.pqCompress(vecs, "vec_id", "embedding", cb).collect()
    assert(codes.forall(r => (0 until 4).forall { mi =>
      val c = r.getInt(mi + 1); c >= 0 && c < 8 }))
    val top = Similarity.pqTopK(vecs.filter(col("vec_id") < 4), vecs,
      "vec_id", "embedding", k = 9, m = 4, kCent = 8).collect()
    // every retrieved neighbor of query q is from q's own cluster
    // (vec_id % 4 == q % 4) — reconstruction error is far smaller than
    // the inter-cluster distance
    assert(top.length == 4 * 9)
    assert(top.forall(r => r.getLong(2) % 4 == r.getLong(0) % 4),
      "PQ retrieved a cross-cluster neighbor")
  }

  test("tfidf ranks a doc-specific rare term above corpus-wide terms") {
    val d = Seq(
      (0L, "spark spark spark zebra"),
      (1L, "spark engine engine"),
      (2L, "spark engine query")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(d, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // doc 0: "zebra" df=1 idf=ln(4/2)+1; "spark" df=3 idf=ln(4/4)+1=1, tf=3
    // tfidf(zebra)=1.693 < tfidf(spark)=3 -> spark first, zebra second
    assert(top((0L, 1)) == "spark" && top((0L, 2)) == "zebra")
    // doc 1: engine tf=2 idf=ln(4/3)+1 ≈ 2.575 beats spark tf=1 idf=1
    assert(top((1L, 1)) == "engine")
    // sklearn smooth-idf value check: tf * (ln((1+N)/(1+df)) + 1)
    val z = TextAnalysis.tfidfTopTerms(d, "doc_id", "text", 2)
      .filter(col("term") === "zebra").select("tfidf").collect()(0).getDouble(0)
    assert(math.abs(z - (math.log(4.0 / 2.0) + 1.0)) < 1e-12)
  }

  test("bm25 ranks by query-term relevance with length normalization") {
    val d = Seq(
      (0L, "join join join hash scan sort sort sort sort sort sort sort sort"), // long, 3 hits of join
      (1L, "join hash scan"), // short, one of each
      (2L, "sort merge exchange broadcast"), // no query terms
      (3L, "join join hash")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopDocs(d, "doc_id", "text",
      Seq("join", "hash", "scan"), 10).collect().map(_.getLong(0))
    // doc 2 has no query terms -> excluded; short all-terms doc 1 wins
    // (length normalization beats raw tf)
    assert(!got.contains(2L))
    assert(got.head == 1L && got.length == 3)
  }

  test("trigram-LM cross-entropy separates typical from atypical docs") {
    val common = "the cat sat on the mat near the hat"
    val d = (0L to 7L).map(i => (i, common)) :+ (8L, "zxqj vwkp qqzz xjvw") :+
      (9L, common)
    val ce = TextAnalysis.trigramCrossEntropy(d.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // gibberish doc draws rare trigrams -> higher cross-entropy
    assert(ce(8L) > ce(0L) + 0.5, s"gibberish ${ce(8L)} vs typical ${ce(0L)}")
    assert(ce(0L) == ce(9L)) // identical docs score identically
    // docs shorter than 3 normalized chars are dropped, not errors
    val tiny = TextAnalysis.trigramCrossEntropy(
      Seq((0L, "ab"), (1L, common)).toDF("doc_id", "text"), "doc_id", "text")
    assert(tiny.count() == 1L)
  }

  test("repetition signals: looped text scores high, varied text low") {
    val d = Seq(
      (0L, "spam spam spam spam spam spam"),              // one bigram repeated 5x
      (1L, "one two three four five six seven"),          // all bigrams distinct
      (2L, "x")                                           // <2 tokens -> dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(0L) == ((0.8, 1.0)))  // 5 occurrences, 1 distinct
    assert(got(1L) == ((0.0, 1.0 / 6.0)))
    assert(!got.contains(2L))
  }

  test("duplicated-span ratio separates copied docs from unique ones") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (0L, shared), (1L, shared),                         // full copies of each other
      (2L, "completely unrelated content that appears nowhere else in corpus x")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanRatio(d, "doc_id", "text", span = 32).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 1.0 && got(1L) == 1.0) // every span shared
    assert(got(2L) == 0.0)                   // no span appears elsewhere
  }

  test("PII: counts find each planted pattern once; redaction removes them all") {
    val pii = Seq(
      (0L, "reach me at jane.doe+x@corp.example.org or 192.168.0.1 ssn 078-05-1120 tel 415-555-0199"),
      (1L, "no pii here, just text with numbers 12345 and a date 2026-08-12")
    ).toDF("doc_id", "text")
    val out = pii.select(col("doc_id") +: TextAnalysis.piiCounts(col("text"))
      :+ TextAnalysis.piiRedact(col("text")).as("red"): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(out(0L)._1 == 1 && out(0L)._2 == 1 && out(0L)._3 == 1 && out(0L)._4 == 1)
    assert(out(0L)._5 ==
      "reach me at [EMAIL] or [IP] ssn [SSN] tel [PHONE]")
    // the date 2026-08-12 (4-2-2) must NOT trip the SSN (3-2-4) pattern
    assert(out(1L) == ((0L, 0L, 0L, 0L, "no pii here, just text with numbers 12345 and a date 2026-08-12")))
  }

  test("decontamination: doc sharing 5-grams with eval is flagged, fresh doc is not") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // 4 of 4 grams in eval
      (2L, "one two three four five six seven"), // disjoint
      (3L, "tiny doc") // < 5 words → 0 by definition
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminationScores(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1.0, true)))
    assert(out(2L) == ((0.0, false)))
    assert(out(3L) == ((0.0, false)))
  }

  test("canonicalUrl normalizes authority case, ports, www, tracking, fragments") {
    val cases = Seq(
      "HTTP://Example.COM/Path/Item?Id=3" -> "http://example.com/Path/Item?Id=3",
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a", // non-default kept
      "http://www.example.com/a" -> "http://example.com/a",
      "http://example.com/a?id=1&utm_source=x&utm_campaign=y" -> "http://example.com/a?id=1",
      "http://example.com/a?utm_source=x" -> "http://example.com/a",
      "http://example.com/a?utm_source=x&id=1" -> "http://example.com/a?id=1",
      "http://example.com/a?id=1#section" -> "http://example.com/a?id=1",
      "http://example.com/" -> "http://example.com",
      "https://WWW.Example.com:443/b/?gclid=abc#x" -> "https://example.com/b",
      "http://example.com/CaseSensitive/PATH" -> "http://example.com/CaseSensitive/PATH",
      // separator-anchoring regressions: params merely CONTAINING a
      // tracking name must survive intact (unanchored strip corrupted
      // them into colliding keys)
      "http://a.com/?xgclid=1" -> "http://a.com/?xgclid=1",
      "http://a.com/?my_utm_source=v" -> "http://a.com/?my_utm_source=v",
      "http://a.com/?xgclid=1&utm_source=y" -> "http://a.com/?xgclid=1",
      // consecutive tracking params (separator-run collapse)
      "http://a.com/p?utm_source=a&utm_campaign=b" -> "http://a.com/p",
      "http://a.com/p?utm_a=1&utm_b=2&id=3" -> "http://a.com/p?id=3",
      "http://a.com/p?id=1&utm_a=x&utm_b=y&z=2" -> "http://a.com/p?id=1&z=2"
    )
    val df = cases.zipWithIndex.map { case ((u, w), i) => (i.toLong, u, w) }
      .toDF("id", "u", "want")
    val out = df.select(col("id"), TextAnalysis.canonicalUrl(col("u")).as("got"),
      col("want")).collect()
    out.foreach(r => assert(r.getString(1) == r.getString(2),
      s"case ${r.getLong(0)}: got '${r.getString(1)}'"))
  }

  test("urlDedup keeps the lowest id per canonical URL") {
    val docs = Seq(
      (0L, "http://example.com/x?id=1"),
      (1L, "HTTP://Example.com/x?id=1&utm_source=a#f"),
      (2L, "http://www.example.com:80/x?id=1"),
      (3L, "http://example.com/y")
    ).toDF("doc_id", "url")
    val out = Dedup.urlDedup(docs, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L) == (("http://example.com/x?id=1", 0L, 3L, true)))
    assert(out(1L) == (("http://example.com/x?id=1", 0L, 3L, false)))
    assert(out(2L) == (("http://example.com/x?id=1", 0L, 3L, false)))
    assert(out(3L) == (("http://example.com/y", 3L, 1L, true)))
  }

  test("ascii_clean matches the regex normalization chain byte-for-byte") {
    val cases = Seq(
      "", " ", "   ", "a", " a ", "a  b", "  a  b  c  ",
      "Hello, World! 123", "tabs\tand\nnewlines", "é û ü ñ", "ümlaut Über",
      "中文 text 混合", "İstanbul KELVIN K", "a!@#$%^&*()b", "1 2  3   4",
      "é combining", " nbsp is not space", "🎉 emoji party 🎊",
      "ends with space ", " starts", "UPPER lower MiXeD 42"
    ) ++ (0 until 300).map { i =>
      val r = new scala.util.Random(i)
      (0 until 60).map(_ => r.nextInt(0x2000).toChar).mkString
    }
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val out = df.select(col("id"),
      TextAnalysis.normalized(col("t")).as("fast"),
      TextAnalysis.normalizedRegex(col("t")).as("ref")).collect()
    out.foreach(r => assert(r.getString(1) == r.getString(2),
      s"case ${r.getLong(0)}: '${r.getString(1)}' vs '${r.getString(2)}'"))
  }

  test("text-scan kernels match their regex twins exactly") {
    val cases = Seq(
      "", " ", "abc", "ABC", "a1b2", "123 456", "hello, world!",
      "NOLOWER TOKENS", "mixed Case tok3ns here", "  pad  ded  ",
      "tabs\tand\nnewlines\rhere", "punct!!! ((()))", "a_b-c.d",
      "é ünïcode mixé", "中文字 and ascii", "🎉🎉 double emoji",
      "x" * 200, ("z" * 50) + " the " + ("9" * 40), "ab",
      "\u4dff\u4e00\u9fff\ua000 cjk range edges", "\u30d2\u30e9 katakana"
    ) ++ (0 until 300).map { i =>
      val r = new scala.util.Random(3000 + i)
      val toks = Seq("ab", "AB", "12", ",.", " ", "\t", "é", "中", "a1",
        "_", "\n", "🎉")
      (0 until 25).map(_ => toks(r.nextInt(toks.length))).mkString
    }
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val out = df.select(col("id"),
      graft.functions.TextScanKernels.alphaTokenCount(col("t")).as("a1"),
      regexp_count(col("t"), lit("(^|\\s)[^\\s]*[a-z][^\\s]*")).as("a2"),
      graft.functions.TextScanKernels.nonWsCharCount(col("t")).as("b1"),
      length(regexp_replace(col("t"), "\\s+", "")).as("b2"),
      graft.functions.TextScanKernels.alnumSpaceCount(col("t")).as("c1"),
      (length(col("t")) - length(regexp_replace(col("t"), "[a-zA-Z0-9 ]", ""))).as("c2"),
      TextAnalysis.bpeishCount(col("t")).as("d1"),
      TextAnalysis.bpeishCountRegex(col("t")).as("d2"),
      graft.functions.TextScanKernels.cjkCharCount(col("t")).as("e1"),
      regexp_count(col("t"), lit("[\\x{4e00}-\\x{9fff}]")).as("e2")).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == r.getInt(2), s"alphaTokens case $id")
      assert(r.getInt(3) == r.getInt(4), s"nonWsChars case $id")
      assert(r.getInt(5) == r.getInt(6), s"alnumSpace case $id")
      assert(r.getInt(7) == r.getInt(8), s"bpeish case $id")
      assert(r.getInt(9) == r.getInt(10), s"cjk case $id")
    }
  }

  test("ws_token_count matches the trim+split builtin chain exactly") {
    val cases = Seq(
      "", " ", "   ", "a", " a ", "a b", "a  b", "  a  b  ",
      "\t", "\ta", "a\t", "a\tb", "\t\t a \n b \r\n", "a\nb\nc",
      "one two three", " leading", "trailing ", " vertical tab",
      "mixé unicode ok", "中文 字", "a b" // nbsp is NOT \s
    ) ++ (0 until 300).map { i =>
      val r = new scala.util.Random(2000 + i)
      val toks = Seq("a", "bb", " ", "\t", "\n", "\r", "\f", "", "é", "9")
      (0 until 15).map(_ => toks(r.nextInt(toks.length))).mkString
    }
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val out = df.select(col("id"),
      TextAnalysis.tokenCount(col("t")).as("fast"),
      TextAnalysis.tokenCountBuiltins(col("t")).as("ref")).collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"case ${r.getLong(0)}: ${r.getInt(1)} vs ${r.getInt(2)}"))
  }

  test("word_set_hits matches the \\b-alternation regex count exactly") {
    val cases = Seq(
      "", "the", " the ", "xthe them theory", "the the the", "a and an",
      "of_to is", "de la casa", "de  la", "de,la", "esde la", "de lax",
      "the\tand\nof", "THE AND", "thé ünd", "la de la de la", "is",
      "w1 the w2 and w3", "und der die das", "le et les des dans",
      "el y los de la es una que", "a", "a a a a", "1a a1 a_b the"
    ) ++ (0 until 300).map { i =>
      val r = new scala.util.Random(1000 + i)
      val toks = Seq("the", "and", "de", "la", "de la", "xx", "a", "_",
        "9", "é", ",", " ")
      (0 until 20).map(_ => toks(r.nextInt(toks.length))).mkString(" ")
    }
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    for (lang <- Seq("en", "de", "fr", "es")) {
      val out = df.select(col("id"),
        TextAnalysis.stopwordHits(col("t"), lang).as("fast"),
        TextAnalysis.stopwordHitsRegex(col("t"), lang).as("ref")).collect()
      out.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"$lang case ${r.getLong(0)}: '${cases(r.getLong(0).toInt)}' " +
          s"${r.getLong(1)} vs ${r.getLong(2)}"))
    }
  }

  test("trigram kernel scorer matches the algebra scorer after rd6") {
    import graft.queries.Q
    val docs = (0 until 300).map { i =>
      val words = (0 until 5 + i % 17).map(j => s"w${(i * 31 + j * 7) % 400}")
      (i.toLong, words.mkString(" ") + (if (i % 5 == 0) " Zq#xv!" else ""))
    }.toDF("doc_id", "text")
    val algebra = TextAnalysis.trigramCrossEntropy(docs, "doc_id", "text")
      .select(col("doc_id"), Q.rd6(col("cross_entropy")).as("ce"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kernel = TextAnalysis.trigramCrossEntropyKernel(docs, "doc_id", "text")
      .select(col("doc_id"), Q.rd6(col("cross_entropy")).as("ce"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel.keySet == algebra.keySet)
    kernel.foreach { case (id, ce) => assert(ce == algebra(id), s"doc $id") }
  }

  test("decontaminationReport scores eval items by training-side leakage") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // fully inside train doc 1
      (101L, "nine ten eleven twelve thirteen"),     // fresh
      (102L, "tiny")).toDF("doc_id", "text")         // < n words -> 0 grams
    val out = Dedup.decontaminationReport(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(100L) == ((2L, 2L, 1.0)))
    assert(out(101L) == ((1L, 0L, 0.0)))
    assert(out(102L) == ((0L, 0L, 0.0)))
  }

  test("bloom-prefiltered decontamination is bit-identical to the exact path") {
    // larger corpus so the bloom actually rejects most shingles, with
    // partial-overlap docs (fractions strictly between 0 and 1)
    val train = (0 until 60).map { i =>
      val t =
        if (i % 3 == 0) s"shared evaluation prefix words here tail token $i extra pad"
        else s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val eval = Seq((1000L, "shared evaluation prefix words here and more benchmark text"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminationScores(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    // a high-fpp filter (many false positives reach the verify join)
    // and a tight one must BOTH reproduce the exact output
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.bloomDecontaminationScores(train, eval, "doc_id", "text",
          n = 5, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
      assert(got sameElements exact, s"fpp=$fpp")
    }
    // the overlap docs really are partially contaminated (non-trivial case)
    val m = exact.map(e => e._1 -> e._2).toMap
    assert(m(0L) > 0.0 && m(0L) < 1.0 && m(1L) == 0.0)
  }

  test("gopher rules: word-salad passes bands, stopword-free doc fails r_stopwords") {
    val gd = Seq(
      (0L, "the cat and the dog sat near the mat while the sun was warm today"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"), // no stopwords
      (2L, "hi") // too short
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(gd, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out(0L) == ((true, true, true)))   // keeps
    assert(out(1L)._2 == false && out(1L)._3 == false) // fails stopwords → dropped
    assert(out(2L)._1 == false && out(2L)._3 == false) // fails token band
  }

  test("url signals count links, distinct hosts, and link-char density") {
    val d = Seq(
      (0L, "read https://a.example.com/x and https://a.example.com/y plus http://b.example.org"),
      (1L, "no links at all in this one")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id") +: TextAnalysis.urlSignals(col("text")): _*)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L)._1 == 3 && out(0L)._2 == 2)
    assert(out(0L)._3 > 0.5) // mostly link characters
    assert(out(1L) == ((0L, 0L, 0.0)))
  }

  test("mixture sampling is deterministic and tracks target rates") {
    import graft.operators.Sampling
    val spark = SparkSpec.session
    val docs = spark.range(20000)
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(2))).as("source"))
    val weight = when(col("source") === "src0", 1.0).otherwise(0.25)
    val key = concat(col("source"), lit(":"), col("doc_id"))
    val kept = Sampling.mixtureSample(docs, key, weight)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") == 10000L)                       // weight 1.0 keeps all
    assert(math.abs(kept("src1") - 2500L) < 250,         // ~25% of 10k
      s"src1 kept ${kept("src1")}")
    // rerun → identical sample (a reproducibility contract, not a property of rand())
    val again = Sampling.mixtureSample(docs, key, weight).count()
    assert(again == kept.values.sum)
  }

  test("shingles of short docs are empty, not an error") {
    val d = Seq((0L, "one two")).toDF("doc_id", "text")
    assert(d.select(size(Dedup.shingles(col("text"), 3))).collect()(0).getInt(0) == 0)
  }
}
