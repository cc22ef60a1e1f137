package graft

import graft.operators.{DataSelection, Dedup}
import org.apache.spark.sql.functions._

/** Corpus-level data selection: line dedup with reassembly, DSIR
  * importance resampling, trained quality filtering. */
class DataSelectionSpec extends SparkSpec {

  import SparkSpec.session.implicits._

  test("lineDedup keeps the first global occurrence and reassembles in order") {
    val docs = Seq(
      (0L, "alpha beta\nshared line\ngamma"),
      (1L, "shared line\nunique one"),
      (2L, "shared line") // every line already seen -> doc dropped
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text",
        split(col("text"), "\n"), sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == (("alpha beta\nshared line\ngamma", 3L, 3L)))
    assert(out(1L) == (("unique one", 2L, 1L)))
    assert(!out.contains(2L))
  }

  test("lineDedup first-occurrence order is (doc, position), not arrival") {
    // "dup" appears at doc 0 pos 2 and doc 1 pos 0: doc 0 wins (lower doc id)
    val docs = Seq((0L, "a\nb\ndup"), (1L, "dup\nz")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", split(col("text"), "\n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "a\nb\ndup" && out(1L) == "z")
  }

  test("intraDocLineDedup removes repeats within a doc but not across docs") {
    val docs = Seq(
      (0L, "a\nb\na\nc\nb"), // repeats of a, b within the doc
      (1L, "a\nz")           // 'a' also here — must survive (different doc)
    ).toDF("doc_id", "text")
    val out = Dedup.intraDocLineDedup(docs, "doc_id", "text",
        split(col("text"), "\n"), sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == (("a\nb\nc", 5L, 3L)))
    assert(out(1L) == (("a\nz", 2L, 2L)))
  }

  test("dsirScores upweights target-like documents and draws deterministically") {
    // target docs are 'xx'-heavy; raw corpus mixes in 'qq'-heavy docs
    val docs = (0 until 40).map { i =>
      val w = if (i % 2 == 0) "xx xx xx xx" else "qq qq qq qq"
      (i.toLong, s"$w $w $w", i % 2 == 0)
    }.toDF("doc_id", "text", "is_target")
    val out = DataSelection.dsirScores(docs, "doc_id", "text",
        col("is_target"), tau = 5.0)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getBoolean(3))).toMap
    // every target-like doc has a higher ratio than every raw-only doc
    val tgt = out.filterKeys(_ % 2 == 0).values.map(_._1)
    val other = out.filterKeys(_ % 2 == 1).values.map(_._1)
    assert(tgt.min > other.max)
    // weights are clipped keep probabilities; off-target docs are damped
    assert(out.values.forall { case (_, w, _) => w >= 0.0 && w <= 1.0 })
    assert(other.isEmpty || out(1L)._2 < 1.0)
    // determinism: a second run draws identical keep bits
    val again = DataSelection.dsirScores(docs, "doc_id", "text",
        col("is_target"), tau = 5.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.view.mapValues(_._3).toMap == again)
  }

  test("packManifest matches the serial concat-and-chunk layout for any shard count") {
    import graft.operators.Packing
    val docs = Seq(
      (10L, "a b c"), (11L, "d e f g h"), (12L, "i"),
      (20L, "j k l m n o p q r s t u v"), (21L, "w x")
    ).toDF("doc_id", "text")
    // serial reference: offsets of (3,5,1,13,2) with +1 separators
    val expect = Map(
      10L -> (3L, 0L), 11L -> (5L, 4L), 12L -> (1L, 10L),
      20L -> (13L, 12L), 21L -> (2L, 26L))
    for (shards <- Seq(1, 3, 256)) {
      val out = Packing.packManifest(docs, "doc_id", "text", ctxLen = 8,
          nShards = shards)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out == expect, s"nShards=$shards")
    }
    val m = Packing.packManifest(docs, "doc_id", "text", ctxLen = 8)
    val bins = m.collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // doc 20 spans tokens 12..24 -> windows 1..3
    assert(bins(20L) == ((1L, 3L, 3L)))
    assert(bins(10L) == ((0L, 0L, 1L)))
  }

  test("temperatureMixture upweights the small source toward the budget") {
    import graft.operators.Sampling
    // source A: 900 tokens, source B: 100 tokens; budget 500.
    // sqrt weights: qA=0.75 qB=0.25 -> rateA=500*0.75/900=0.41(6),
    // rateB=min(1, 500*0.25/100)=1.0 — B kept whole, A downsampled
    val docs = ((0 until 90).map(i => (i.toLong, "A", Seq.fill(10)("w").mkString(" "))) ++
      (90 until 100).map(i => (i.toLong, "B", Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val out = Sampling.temperatureMixture(docs, "doc_id", "source", "text", 500L)
      .select("doc_id", "source", "rate")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val bySource = out.groupBy(_._2)
    assert(bySource("B").size == 10) // rate 1.0 keeps everything
    assert(bySource("B").forall(_._3 == 1.0))
    assert(bySource("A").forall(_._3 == 0.416667))
    // the hash draw keeps roughly rate*n of A (deterministic exact set)
    val nA = bySource("A").size
    assert(nA > 20 && nA < 55, s"kept $nA of 90")
    // rerun is bit-identical (pure hash draw, no RNG)
    val again = Sampling.temperatureMixture(docs, "doc_id", "source", "text", 500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.map(_._1).toSet)
  }

  test("packManifest with a custom token count lays out BPE tokens") {
    import graft.operators.{Packing, TextAnalysis}
    val docs = Seq((0L, "the the"), (1L, "in an")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, "text",
      graft.queries.PipelineQueries.bpeMerges)
    val m = Packing.packManifest(enc, "doc_id", "text", ctxLen = 8,
        nTokens = Some(col("bpe_n_tokens")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "the the" -> [the][ ][the] = 3 BPE tokens (t+h then th+e merges);
    // "in an" -> [in][ ][an] = 3
    assert(m(0L) == ((3L, 0L)))
    assert(m(1L) == ((3L, 4L))) // starts after 3 tokens + 1 separator
  }

  test("qualityClassifier distills the gopher label with high agreement") {
    val good = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over a lazy dog near the riverbank today"))
    val bad = (30 until 60).map(i => (i.toLong, "zz yy xx ww vv uu tt ss rr qq"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val out = DataSelection.qualityClassifier(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // perfect separation on a linearly separable corpus
    assert(out.forall { case (_, (label, _, keep)) => keep == (label == 1L) })
    // scores actually separate (not all ~0.5)
    assert(out(0L)._2 > 0.9 && out(30L)._2 < 0.1)
  }

  test("dsir kernel path matches the algebra twin after rd6") {
    import graft.queries.Q
    val docs = (0 until 240).map { i =>
      val words = (0 until 6 + i % 13).map(j => s"w${(i * 17 + j * 5) % 300}")
      (i.toLong, words.mkString(" "), i % 4 == 0)
    }.toDF("doc_id", "text", "is_target")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), Q.rd6(col("log_ratio")).as("lr"),
        col("weight"), col("keep"))
      .collect().map(r =>
        r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val kernel = norm(DataSelection.dsirScores(docs, "doc_id", "text",
      col("is_target"), tau = 25.0))
    val algebra = norm(DataSelection.dsirScoresAlgebra(docs, "doc_id", "text",
      col("is_target"), tau = 25.0))
    assert(kernel.keySet == algebra.keySet)
    kernel.foreach { case (id, v) => assert(v == algebra(id), s"doc $id") }
  }

  test("rankByScore equals the serial global row_number at any shard count") {
    // skewed scores (half the mass piles up at 0.0) + ties broken by id
    val scored = (0 until 97).map { i =>
      val s = if (i % 2 == 0) 0.0 else math.sin(i.toDouble) * 10
      (i.toLong, s)
    }.toDF("doc_id", "score")
    val serial = scored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").asc, col("doc_id").asc)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (shards <- Seq(1, 4, 64)) {
      val got = DataSelection.rankByScore(scored, "doc_id", "score", shards)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == serial, s"nShards=$shards")
    }
  }

  test("rankByScore with byCols ranks within each group, at any shard count") {
    val scored = (0 until 90).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", math.cos(i.toDouble) * 5)
    }.toDF("doc_id", "grp", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("score").asc, col("doc_id").asc)
    val serial = scored.withColumn("rank", row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (shards <- Seq(1, 7, 64)) {
      val out = DataSelection.rankByScore(scored, "doc_id", "score", shards,
        byCols = Seq("grp")).collect()
      val got = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == serial, s"nShards=$shards")
      // group_n carries each group's total
      assert(out.forall(r =>
        r.getLong(4) == (if (r.getString(1) == "a") 30L else 60L)))
    }
  }

  test("perplexityBuckets cuts the corpus into equal thirds by LM score") {
    // fluent English docs vs consonant noise: noise must land in tail
    val docs = (0 until 30).map { i =>
      val t =
        if (i < 20) s"the quick brown fox number $i jumps over the lazy dog and runs on"
        else s"zqxv jkwp $i bfgt mzzd qqpl xkcv wwrt zzvb nmqp"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val out = DataSelection.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out.size == 30)
    // thirds are exactly balanced (n divisible by 3)
    val sizes = out.values.groupBy(_._3).map { case (b, v) => b -> v.size }
    assert(sizes == Map(0L -> 10, 1L -> 10, 2L -> 10))
    // rank order agrees with score order; buckets are rank-monotone
    val byRank = out.values.toSeq.sortBy(_._2)
    assert(byRank.map(_._1) == byRank.map(_._1).sorted)
    assert(byRank.map(_._3) == byRank.map(_._3).sorted)
    // all 10 noise docs have higher cross-entropy than any fluent doc
    val noise = out.filterKeys(_ >= 20).values
    assert(noise.forall(_._4 == "tail"))
    assert(out.filterKeys(_ < 20).values.count(_._4 == "head") == 10)
  }
}
