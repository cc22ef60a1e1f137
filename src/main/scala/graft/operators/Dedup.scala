package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines.
  *
  * Scale design: exact dedup is a single hash-groupBy; MinHash/SimHash
  * fan out to (doc × band) rows and self-join on band buckets — the
  * classic LSH trick that turns an O(n²) pairwise problem into a
  * bucket-local join, which shuffles on bucket key and parallelizes
  * across the cluster. Candidate verification is then a cheap equi-join
  * on the candidate pairs only.
  */
object Dedup {

  /** Keep the lowest-id row per exact text; report group size. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word shingles of size n as a distinct array column. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    // sequence() counts DOWN when end < start — guard short docs
    val idx = when(size(words) < n, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(words) - (n - 1)))
    array_distinct(transform(idx,
      i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j)): _*)))
  }

  /** One row per (doc, shingle position). Built word-row-wise
    * (posexplode + lead window) rather than via an array lambda: a
    * lambda over `split(text)` re-evaluates the regex split per
    * element (no subexpression elimination inside higher-order
    * functions), turning shingling O(words²) per doc. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("__pos", "__w")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val leads = (1 until n).map(j => lead(col("__w"), j).over(w))
    val parts = col("__w") +: leads
    words
      .withColumn("__sh", concat_ws(" ", parts: _*))
      .withColumn("__full", if (n > 1) leads.last.isNotNull else lit(true))
      .filter(col("__full"))
      .select(col(idCol), col("__sh"))
  }

  /** Shingle hash families for MinHash. Both use double hashing —
    * TWO base hashes per shingle, permutation j = h1 XOR (j·h2) — so
    * the k permutations cost O(1) hash invocations per shingle instead
    * of O(k). h2 is truncated to 48 bits so j·h2 stays inside a signed
    * long under ANSI; XOR (not +) then preserves h1's full range, so
    * collision behavior matches k independent hashes.
    *  - `Xxhash` (default production path): codegen'd xxhash64.
    *  - `Md5` (oracle path): the two 48-bit halves of one md5 —
    *    exact integer arithmetic any engine reproduces. */
  sealed trait HashFamily
  object HashFamily {
    case object Xxhash extends HashFamily
    case object Md5 extends HashFamily
  }

  /** MinHash signatures: k independent hash permutations approximated
    * by double hashing over each shingle; signature j = min over
    * shingles (duplicates don't affect min — no distinct needed).
    * Returns one row per doc with `minhash` long array. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, numHashes: Int,
                        family: HashFamily = HashFamily.Xxhash): DataFrame = {
    val sh0 = shingleRows(docs, idCol, textCol, shingleSize)
    // the two base hashes are computed ONCE per shingle row, before the
    // aggregation; each permutation is then pure long arithmetic
    val sh = family match {
      case HashFamily.Xxhash =>
        sh0.withColumn("__h1", xxhash64(col("__sh")))
          .withColumn("__h2", shiftrightunsigned(xxhash64(lit("salt"), col("__sh")), 16))
      case HashFamily.Md5 =>
        sh0.withColumn("__m", md5(col("__sh").cast("binary")))
          .withColumn("__h1", conv(substring(col("__m"), 1, 12), 16, 10).cast("long"))
          .withColumn("__h2", conv(substring(col("__m"), 13, 12), 16, 10).cast("long"))
    }
    val hashCols = (0 until numHashes)
      .map(j => min(col("__h1").bitwiseXOR(lit(j.toLong) * col("__h2"))).as(s"__h$j"))
    sh.groupBy(col(idCol)).agg(hashCols.head, hashCols.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(j => col(s"__h$j")): _*).as("minhash"))
  }

  /** LSH banding: split the signature into bands of `rowsPerBand`,
    * bucket-join docs sharing any band value, emit candidate pairs
    * (a < b) with their estimated jaccard (signature agreement).
    *
    * Callers should `persist()` `signatures` first: this plan
    * references it four times (band self-join + two join-backs), and
    * Spark will otherwise recompute the shingle+hash pipeline per
    * reference — at corpus scale that is 4 full scans. */
  /** Distinct LSH candidate pairs (a < b) only — no signature
    * join-back, no jaccard estimate. Use when the consumer (e.g.
    * [[nearDupGroups]]) needs just the edge list: skips two joins that
    * would drag the wide signature arrays back through the plan. */
  def minhashCandidatePairIds(signatures: DataFrame, idCol: String,
                              numHashes: Int, rowsPerBand: Int): DataFrame = {
    // rowsPerBand > numHashes would give nBands = 0 and sequence(0, -1)
    // counts DOWN (fabricated bands, recall silently collapses); a
    // non-divisible split would silently ignore the remainder hashes
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val nBands = numHashes / rowsPerBand
    // slim (id, band, key) rows for the bucket self-join — the wide
    // signature arrays stay out of the shuffle; they're joined back
    // once per DISTINCT candidate pair, not per band collision
    val bands = signatures.select(
      col(idCol).as("a"),
      posexplode(transform(
        sequence(lit(0), lit(nBands - 1)),
        b => struct(b.as("band"), slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand)).as("key")))))
      .select(col("a"), col("col.band"), col("col.key"))
    bands.join(bands.select(col("a").as("b"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  def minhashCandidatePairs(signatures: DataFrame, idCol: String,
                            numHashes: Int, rowsPerBand: Int): DataFrame = {
    val pairs = minhashCandidatePairIds(signatures, idCol, numHashes, rowsPerBand)
    val sig = signatures.select(col(idCol), col("minhash"))
    pairs
      .join(sig.select(col(idCol).as("a"), col("minhash").as("__sa")), Seq("a"))
      .join(sig.select(col(idCol).as("b"), col("minhash").as("__sb")), Seq("b"))
      .select(col("a"), col("b"),
        (size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y), eq => eq))
          .cast("double") / size(col("__sa"))).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard for a pair frame (a, b) — verification step
    * after LSH candidate generation. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingleSize: Int): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, shingleSize)
      .groupBy(col(idCol)).agg(collect_set(col("__sh")).as("__sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("__sh").as("__sa")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("__sh").as("__sb")), Seq("b"))
      .withColumn("jaccard",
        size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          size(array_union(col("__sa"), col("__sb"))))
      .drop("__sa", "__sb")
  }

  /** Near-duplicate GROUPS from a candidate-pair frame (a, b):
    * connected components, adaptive. Candidate edges (near-dup pairs
    * surviving LSH banding) are a vanishing fraction of corpus size,
    * so below `driverUnionFindThreshold` edges the components are
    * solved with a driver union-find — ONE limited collect (no
    * separate count() probe), no shuffle rounds. Above it
    * (pathological corpora), falls back to iterative minimum-label
    * propagation with pointer jumping: O(log diameter) distributed
    * join+agg rounds. `driverUnionFindThreshold = -1` (default)
    * auto-sizes the crossover from the driver heap (~3% of max heap
    * at ~150 B/edge, clamped to [100k, 8M]); pass an explicit value
    * to pin it (0 forces the distributed path). Ids are cast to long.
    * Returns (id, group) where group = the smallest doc id in the
    * component; "keep" policy = keep id == group. */
  def nearDupGroups(pairs: DataFrame, idColA: String = "a", idColB: String = "b",
                    maxRounds: Int = 20,
                    driverUnionFindThreshold: Long = -1L): DataFrame = {
    val spark = pairs.sparkSession
    // Auto-size the driver-vs-distributed crossover from the actual
    // driver heap when the caller doesn't pin it: each collected edge
    // costs ~150 bytes on the driver (Row of 2 boxed longs + array +
    // union-find map entries), and we budget at most ~3% of max heap
    // for the edge list so the collect can never be the OOM. A 4 GiB
    // driver auto-sizes to ~860k edges; 128 GiB to the 8M cap.
    val threshold =
      if (driverUnionFindThreshold >= 0) driverUnionFindThreshold
      else math.min(8_000_000L, math.max(100_000L, Runtime.getRuntime.maxMemory / 32 / 150))
    // Single action: collect up to threshold+1 DISTINCT undirected
    // edges. LSH-candidate edge sets are a vanishing fraction of the
    // corpus (only near-dup pairs survive banding) — when they fit, a
    // driver union-find replaces O(diameter) shuffle rounds with one
    // limited collect. The old shape (count() probe, then a second full
    // collect pass, on a doubled src/dst union) ran the upstream pair
    // pipeline twice and shuffled 2x the edges; this runs it once.
    val distinctPairs = pairs
      .select(col(idColA).cast("long").as("src"), col(idColB).cast("long").as("dst"))
      .distinct()
    // clamp BEFORE the +1: threshold = Long.MaxValue must not wrap
    // negative (head(neg) silently returns nothing)
    val limit = (math.min(threshold, Int.MaxValue - 2L) + 1).toInt
    val head = distinctPairs.head(limit)
    // driver path ONLY when the collect is provably complete:
    // head.length == limit is ambiguous (exactly limit edges exist, or
    // the collect truncated at a threshold pinned above the Int clamp)
    // — either way the safe answer is the distributed path
    if (head.length < limit) {
      val es = head.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
      import spark.implicits._
      rows.toDF("id", "group")
    } else {
      // pathological corpus: too many edges for the driver — fully
      // distributed label propagation. Symmetrize the edges only here
      // (the driver path never needs the doubled frame) and cache them:
      // every propagation round scans them.
      val edges = distinctPairs
        .unionByName(distinctPairs.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().cache()
      // every round ends in an eager localCheckpoint: iterative plans
      // otherwise chain their lineage (the self-join below would DOUBLE
      // it per round — exponential plan growth OOMs the driver around
      // round 7); checkpoint blocks are reclaimed by the ContextCleaner
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("group", col("id")).localCheckpoint(true)
      var round = 0
      var converged = false
      while (round < maxRounds && !converged) {
        val neighborMin = edges
          .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("group")).as("__ng"))
        // fold the convergence flag into the same pass — no second
        // join against the previous labels per round
        // materialized before the self-join below references it on BOTH
        // sides — the two parents hash on different keys (id vs group),
        // so ReuseExchange can't dedup them and an unmaterialized prop
        // would recompute the labels⋈neighborMin propagation twice per
        // round on exactly the corpus-scale path this fallback exists for
        val prop = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("group"), coalesce(col("__ng"), col("group"))).as("group"),
            (coalesce(col("__ng"), col("group")) < col("group")).as("__chg"))
          .localCheckpoint(true)
        // pointer-jumping shortcut (path doubling): follow each node's
        // label to THAT node's label in the same round — label chains
        // halve every round, so convergence is O(log diameter) joins
        // instead of O(diameter); a 100-TB corpus with a pathological
        // chain component still converges inside maxRounds
        val next = prop
          .join(prop.select(col("id").as("__gid"), col("group").as("__gg")),
            col("group") === col("__gid"), "left")
          .select(col("id"),
            least(col("group"), coalesce(col("__gg"), col("group"))).as("group"),
            (col("__chg") ||
              coalesce(col("__gg"), col("group")) < col("group")).as("__chg"))
          .localCheckpoint(true)
        val changed = next.filter(col("__chg")).limit(1).count()
        labels = next.select("id", "group")
        converged = changed == 0
        round += 1
      }
      // unpersist BEFORE the convergence check: the symmetrized edge
      // frame is the largest intermediate here and must not stay
      // pinned on the failure path
      edges.unpersist(blocking = false)
      require(converged,
        s"nearDupGroups label propagation did not converge in $maxRounds rounds")
      labels
    }
  }

  /** 64-bit SimHash over word unigrams: per bit, sign of Σ±1 weighted
    * by each word's hash bit. Near-dups = small hamming distance. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$b")
    }
    val agg = words.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** SimHash with md5-derived bits, emitted as a 16-char hex string —
    * the engine-portable form (any engine with md5 + substring computes
    * the identical value; used by the DuckDB oracle). Bit b of a word
    * lives in hex char b/4 of md5(word) at position b%4; output char i
    * packs result bits 4i..4i+3. Same sign rule as [[simhash]]
    * (Σ±1 > 0, ties → 0). */
  def simhashHex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hexChars = "0123456789abcdef"
    val words = docs.select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .withColumn("__md5", md5(col("__w").cast("binary")))
    val bitCols = (0 until 64).map { b =>
      val nib = conv(substring(col("__md5"), b / 4 + 1, 1), 16, 10).cast("int")
      sum(when(shiftright(nib, b % 4).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$b")
    }
    val agg = words.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
    val outChars = (0 until 16).map { ci =>
      val nib = (0 until 4).map { p =>
        when(col(s"__b${4 * ci + p}") > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      lit(hexChars).substr(nib + 1, lit(1))
    }
    agg.select(col(idCol), concat(outChars: _*).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs above a similarity
    * threshold, bucketed by LSH to avoid the full cross join at scale
    * (see [[Similarity.randomHyperplaneBuckets]]). Brute-force within
    * bucket. */
  /** Cross-document duplicated-substring signal (the per-doc scoring
    * face of exact substring dedup, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"): slide a `span`-char
    * window over the normalized text and report, per doc, the fraction
    * of window occurrences whose window also appears in ANOTHER doc.
    *
    * Windows shuffle as portable 48-bit md5 halves (8 bytes, not
    * `span` chars — 4-8× narrower shuffle; the same hash family the
    * MinHash/multimodal oracles replicate in SQL). The groupBy over
    * distinct windows is the scale cost — the classic exact approach;
    * production substring dedup at 100 TB swaps it for suffix-array /
    * Bloom prefiltering, which changes recall, not this signal's
    * semantics. */
  def duplicatedSpanRatio(docs: DataFrame, idCol: String, textCol: String,
                          span: Int = 32): DataFrame = {
    val wins = TextAnalysis.parallelized(docs, idCol)
      .select(col(idCol), TextAnalysis.normalized(col(textCol)).as("__c"))
      .filter(length(col("__c")) >= span)
      .select(col(idCol),
        explode(graft.functions.CharNGrams.ngrams(col("__c"), span)).as("__w"))
      .select(col(idCol),
        conv(substring(md5(col("__w").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("__h"))
    // "appears in ≥2 distinct docs" ⇔ min(doc) ≠ max(doc) over the
    // window-hash partition: a whole-partition window agg computes it
    // in ONE pass over the exploded windows (the former
    // groupBy-count_distinct + join-back recomputed the explode+md5
    // for the probe side — 2× the dominant cost)
    val w = Window.partitionBy(col("__h"))
    wins
      .withColumn("__dup", min(col(idCol)).over(w) =!= max(col(idCol)).over(w))
      .groupBy(col(idCol))
      .agg((sum(col("__dup").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("dup_span_frac"))
  }

  /** C4-style line-level deduplication WITH reassembly (Raffel et al.
    * 2020 §2.2 drop any three-sentence span seen before; here the unit
    * is a caller-defined "line"): across the whole corpus keep only
    * the FIRST occurrence of each distinct line — first in the global
    * (doc, position) order — delete every other occurrence, and
    * rebuild each document from its surviving lines in original order.
    *
    * `lines` is the splitter (an array-of-strings column over the
    * text): `split(col(text), "\n+")` in production; the caller picks
    * the unit (lines, sentences, fixed word chunks). Empty lines are
    * dropped before dedup. Documents whose every line is deleted
    * disappear from the output (C4 semantics).
    *
    * Scale shape: one explode pass; lines shuffle as portable 48-bit
    * md5 halves (8 bytes, not line text — the same family as
    * [[duplicatedSpanRatio]]); "first occurrence" is a min-struct over
    * the hash partition, so ONE window pass decides keeps (no
    * self-join back); reassembly is the per-doc groupBy that any
    * downstream write needs anyway. ~n²/2⁴⁹ hash-collision odds merge
    * distinct lines — swap in the full md5 when that matters. */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                lines: Column, sep: String = "\n"): DataFrame = {
    val exploded = TextAnalysis.parallelized(docs, idCol)
      .select(col(idCol), posexplode(lines).as(Seq("__p", "__l")))
      .filter(length(col("__l")) > 0)
      .withColumn("__h",
        conv(substring(md5(col("__l").cast("binary")), 1, 12), 16, 10)
          .cast("long"))
    val w = Window.partitionBy(col("__h"))
    exploded
      .withColumn("__keep",
        struct(col(idCol), col("__p")) ===
          min(struct(col(idCol), col("__p"))).over(w))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__p"), col("__l"))))),
          x => x("__l")), sep).as("clean_text"),
        count(lit(1)).as("n_lines"),
        sum(col("__keep").cast("long")).as("n_kept"))
      .filter(col("n_kept") > 0)
  }

  /** Within-document repeated-line removal (the Gopher/C4 "dedupe
    * lines within a page" cleanup): keep each document's FIRST
    * occurrence of every distinct line, drop later repeats, rebuild
    * the text. Same one-explode shape as [[lineDedup]] but the window
    * partitions by (doc, line-hash) — keys never cross documents, so
    * a pre-partitioned/bucketed corpus dedupes with NO cross-doc
    * shuffle at all. */
  def intraDocLineDedup(docs: DataFrame, idCol: String, textCol: String,
                        lines: Column, sep: String = "\n"): DataFrame = {
    val exploded = TextAnalysis.parallelized(docs, idCol)
      .select(col(idCol), posexplode(lines).as(Seq("__p", "__l")))
      .filter(length(col("__l")) > 0)
      .withColumn("__h",
        conv(substring(md5(col("__l").cast("binary")), 1, 12), 16, 10)
          .cast("long"))
    val w = Window.partitionBy(col(idCol), col("__h"))
    exploded
      .withColumn("__keep", col("__p") === min(col("__p")).over(w))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__p"), col("__l"))))),
          x => x("__l")), sep).as("clean_text"),
        count(lit(1)).as("n_lines"),
        sum(col("__keep").cast("long")).as("n_kept"))
  }

  /** Benchmark decontamination (Lee et al. / GPT-3 appendix style):
    * for each training doc, the fraction of its DISTINCT word n-grams
    * that also occur anywhere in the evaluation corpus. Docs shorter
    * than n words score 0 (nothing to leak).
    *
    * Scale shape: both sides shingle with the shared split-once rows
    * path (no O(words²) lambda); the eval side reduces to a distinct
    * n-gram set, which for a benchmark suite is tiny next to 100 TB of
    * training data — so it broadcasts and the training side is ONE
    * map-side hash-join pass plus a per-doc aggregation on the
    * already-doc-partitioned rows. Set broadcastEval=false to fall
    * back to a shuffle join when the eval corpus is itself huge. */
  def decontaminationScores(train: DataFrame, eval: DataFrame, idCol: String,
                            textCol: String, n: Int = 5,
                            threshold: Double = 0.5,
                            broadcastEval: Boolean = true): DataFrame = {
    val trainG = shingleRows(train, idCol, textCol, n)
      .select(col(idCol), col("__sh")).distinct()
    val evalG0 = shingleRows(eval, idCol, textCol, n)
      .select(col("__sh")).distinct().withColumn("__hit", lit(1))
    val evalG = if (broadcastEval) broadcast(evalG0) else evalG0
    val scored = trainG.join(evalG, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") /
        count(lit(1)).cast("double")).as("contamination_frac"))
    train.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("contamination_frac"), lit(0.0)).as("contamination_frac"))
      .withColumn("contaminated", col("contamination_frac") >= threshold)
  }

  /** URL-level dedup — the CommonCrawl first-pass key (one fetch per
    * canonical URL before any content comparison): canonicalize via
    * [[TextAnalysis.canonicalUrl]], keep the lowest id per canonical
    * form. One window pass partitioned by the canonical URL (a
    * high-cardinality key — shuffles like exact content dedup and for
    * the same reason). */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val w = Window.partitionBy(col("canonical_url"))
    docs
      .withColumn("canonical_url", TextAnalysis.canonicalUrl(col(urlCol)))
      .withColumn("keep_id", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("keep", col(idCol) === col("keep_id"))
      .select(col(idCol), col("canonical_url"), col("keep_id"),
        col("n_copies"), col("keep"))
  }

  /** Per-EVAL-doc leakage report — the other direction of
    * [[decontaminationScores]]: for each benchmark item, how much of
    * it already sits in the training corpus (the "is my eval
    * compromised" census run before trusting a benchmark number).
    * Scale shape: the eval n-gram set broadcasts (it's the small
    * side); the 100-TB training corpus is scanned ONCE map-side, and
    * only the intersected shingles — bounded by the eval set, not the
    * corpus — survive to the distinct + join-back. */
  def decontaminationReport(train: DataFrame, eval: DataFrame, idCol: String,
                            textCol: String, n: Int = 5): DataFrame = {
    val evalG = shingleRows(eval, idCol, textCol, n)
      .select(col(idCol), col("__sh")).distinct()
    val evalSet = broadcast(evalG.select(col("__sh")).distinct())
    val hit = shingleRows(train, idCol, textCol, n)
      .select(col("__sh")).join(evalSet, "__sh")
      .distinct().withColumn("__hit", lit(1L))
    val perDoc = evalG.join(hit, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_leaked"))
    eval.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
        coalesce(col("n_leaked").cast("double") /
          col("n_grams").cast("double"), lit(0.0)).as("leaked_frac"))
  }

  /** Two-phase decontamination for eval suites too large to ship as a
    * broadcast hash set: a Bloom filter over the eval n-grams rejects
    * the overwhelming majority of training shingles MAP-SIDE (~10
    * bits/key at 1% fpp vs tens of bytes/key for the exact set — a 1B
    * n-gram suite is ~1.2 GB of bits, broadcastable where its hash set
    * is not), then ONLY the bloom survivors shuffle-join the exact
    * eval set to kill false positives. Bloom filters have no false
    * negatives and the verify join removes every false positive, so
    * the output is bit-identical to [[decontaminationScores]] — same
    * columns, same oracle. The bloom probe is the one deliberate UDF:
    * a broadcast-bitset membership test has no builtin Column form,
    * and the probe is a couple of xxhash64s + bit reads per row —
    * cheap next to the scan it prunes.
    *
    * Scale shape: eval is scanned twice (size estimate + bloom build:
    * one `treeAggregate` each, both tiny next to training); training
    * shingles are scanned once — the per-doc denominator is a
    * map-side-combinable count on rows already partitioned by doc, and
    * only the bloom survivors (true hits + fpp·misses) reach the
    * shuffle join. */
  def bloomDecontaminationScores(train: DataFrame, eval: DataFrame,
                                 idCol: String, textCol: String, n: Int = 5,
                                 threshold: Double = 0.5,
                                 fpp: Double = 0.01): DataFrame = {
    val evalG = shingleRows(eval, idCol, textCol, n)
      .select(col("__sh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEval = math.max(1L, evalG.count())
    val bloom = evalG.stat.bloomFilter("__sh", nEval, fpp)
    val bloomBc = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bloomBc.value.mightContainString(s))
    val trainG = shingleRows(train, idCol, textCol, n)
      .select(col(idCol), col("__sh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = trainG.groupBy(col(idCol)).agg(count(lit(1)).as("__total"))
    val hits = trainG.filter(mightContain(col("__sh")))
      .join(evalG.withColumn("__hit", lit(1)), Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("__hit"), lit(0))).as("__hits"))
    val scored = totals.join(hits, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          col("__total").cast("double")).as("contamination_frac"))
    val out = train.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("contamination_frac"), lit(0.0)).as("contamination_frac"))
      .withColumn("contaminated", col("contamination_frac") >= threshold)
      // eagerly materialize the SLIM per-doc result so the two
      // corpus-scale shingle caches (and the bloom broadcast) release
      // NOW — unreleased they pinned executor storage for the session
      // lifetime, one full train-shingle frame per call
      .localCheckpoint(true)
    evalG.unpersist(blocking = false)
    trainG.unpersist(blocking = false)
    bloomBc.destroy()
    out
  }

  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        planes: Int, threshold: Double, seed: Long = 42L): DataFrame = {
    // deliberately NOT persisted: recomputing the hyperplane
    // projection per self-join side is a handful of dot products per
    // row — cheaper than pinning the embedding frame (same measured
    // trade as semDedup's assignment)
    val bucketed = Similarity.randomHyperplaneBuckets(emb, vecCol, planes, seed)
      .withColumn("__n", Similarity.norm(col(vecCol)))
    val l = bucketed.select(col(idCol).as("a"), col(vecCol).as("__va"), col("__n").as("__na"), col("bucket"))
    val r = bucketed.select(col(idCol).as("b"), col(vecCol).as("__vb"), col("__n").as("__nb"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      // norms precomputed per vector (same doubles, 1 pass per pair)
      .withColumn("cosine", Similarity.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine").distinct()
  }

  /** SemDedup (Abbas et al. 2023, arXiv:2303.09540 — semantic dedup
    * via embedding clustering; reference's near-dup surface is textual
    * only, this is the embedding-space analog the paper applies to
    * LAION/C4). Each vector joins its nearest of `nClusters`
    * deterministically-sampled centroids — the same engine-portable
    * md5-ordered sample as [[Similarity.ivfTopK]], collected once
    * (nClusters × dim, bounded) and inlined as LITERALS, so assignment
    * is a zero-shuffle per-row argmax projection. A document is a
    * duplicate when some LOWER-id cluster-mate has cosine ≥ `tau`
    * (the paper keeps one representative per semantic-dup set; lowest
    * id is the deterministic choice). Pairwise work is confined within
    * clusters — Σ cᵢ² not n²; at 100 TB, scale `nClusters` with the
    * corpus to bound cluster width, and the cluster-key equi-join is
    * the only shuffle.
    *
    * Returns one row per input vector: (id, cluster, is_dup). */
  /** Engine-portable deterministic centroid sample (the
    * [[Similarity.ivfTopK]] idiom): first `nClusters` vectors in
    * md5(id)-hex order. Bounded collect (nClusters × dim). */
  private[graft] def sampleCentroids(emb: DataFrame, idCol: String, vecCol: String,
                                     nClusters: Int): Array[(Int, Array[Float])] =
    emb.select(col(idCol), col(vecCol))
      // a zero-norm embedding (failed/padded row) must never become a
      // centroid: dot/0 = NaN scores, and NaN sorts ABOVE every finite
      // struct in array_max — the whole corpus would silently collapse
      // into that one cell (and the >32-cell kernel, where NaN never
      // wins a comparison, would assign DIFFERENTLY — breaking the
      // column/kernel parity contract)
      .filter(col(vecCol).isNotNull &&
        Similarity.dot(col(vecCol), col(vecCol)) > 0)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(nClusters)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  /** Centroid L2 norm with the same ascending-index double fold as
    * [[graft.functions.ArrayDotProduct]] / the oracle's term-by-term
    * dotSql — one shared definition so the driver-side literal, the
    * kernel, and the SQL replica hold identical doubles. */
  private[graft] def centroidNorm(vec: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < vec.length) { s += vec(i).toDouble * vec(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Nearest-centroid id as a zero-shuffle per-row projection:
    * argmax over (dot/‖c‖, -cell) structs = highest NORMALIZED dot,
    * ties → lowest cell. The division by the centroid norm makes this
    * spherical assignment (row norm is constant per row and cannot
    * change its argmax): with raw dots the largest-norm centroid
    * swallows the corpus — measured max cluster 56,825 of 200k (28%,
    * median 1) on uniform synthetic vectors, and the within-cluster
    * pair scan is Σ cᵢ², so that one cluster was a 3.2-billion-pair
    * quadratic bomb. One definition shared by the batch [[semDedup]]
    * and the streaming gate so the two runtimes can never assign
    * differently. */
  private[graft] def clusterAssignCol(vecCol: Column,
                                      centroids: Array[(Int, Array[Float])]): Column = {
    val scoredCells = array(centroids.toIndexedSeq.map { case (cell, vec) =>
      struct((Similarity.dot(vecCol, lit(vec)) / lit(centroidNorm(vec))).as("d"),
        lit(-cell).as("negc"))
    }: _*)
    (-array_max(scoredCells).getField("negc")).cast("long")
  }

  /** Imperative twin of [[clusterAssignCol]] for LARGE centroid sets:
    * array_max over an n-struct array of expanded dots is a
    * CodegenFallback — interpreted per row with per-row struct-array
    * allocation (the pqCompress lesson; measured ~2.5 ms/row at 256
    * cells, which turned a 200k-vector soak into 12 minutes). The
    * kernel is the same double arithmetic in the same order
    * (ascending-i dot fold, strict `>` keeps the LOWEST cell on
    * ties), broadcast centroid matrix, ~3 ns/dot — and a parity spec
    * pins the two paths equal. */
  private[graft] def clusterAssignKernel(
      centroids: Array[(Int, Array[Float])]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cells = centroids.map(_._1.toLong)
    val mats = centroids.map(_._2.map(_.toDouble))
    val norms = centroids.map(c => centroidNorm(c._2))
    udf { (vec: Seq[Float]) =>
      var best = 0
      var bestD = Double.NegativeInfinity
      var c = 0
      while (c < mats.length) {
        val m = mats(c)
        var d = 0.0
        var i = 0
        while (i < m.length) { d += vec(i).toDouble * m(i); i += 1 }
        // same (dot, then one divide) arithmetic as the column algebra
        d = d / norms(c)
        if (d > bestD) { bestD = d; best = c }
        c += 1
      }
      cells(best)
    }
  }

  /** Assignment with the codegen-friendly path for small centroid
    * sets (the oracle-replicable column algebra) and the kernel for
    * large ones — identical output either way. */
  private[graft] def clusterAssignAuto(vecCol: Column,
                                       centroids: Array[(Int, Array[Float])]): Column =
    if (centroids.length <= 32) clusterAssignCol(vecCol, centroids)
    else clusterAssignKernel(centroids)(vecCol)

  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               nClusters: Int, tau: Double): DataFrame = {
    val centroids = sampleCentroids(emb, idCol, vecCol, nClusters)
    // empty corpus → empty result with the contract schema (an empty
    // centroid array would otherwise fail getField at plan time)
    if (centroids.isEmpty)
      return emb.select(col(idCol), lit(-1L).as("cluster"), lit(false).as("is_dup"))
    // deliberately NOT persisted: the assignment is recomputed per
    // self-join side, but the kernel argmax is cheap relative to the
    // within-cluster pair scan — a persist + eager-checkpoint variant
    // measured SLOWER at the 200k soak (19.2 vs 15 s warm), and at
    // corpus scale pinning the full embedding frame is its own memory
    // hazard vs rescanning columnar storage
    val assigned = emb
      .withColumn("cluster", clusterAssignAuto(col(vecCol), centroids))
      .withColumn("__n", Similarity.norm(col(vecCol)))
    val l = assigned.select(col(idCol).as("__a"), col(vecCol).as("__va"),
      col("__n").as("__na"), col("cluster"))
    val r = assigned.select(col(idCol).as("__b"), col(vecCol).as("__vb"),
      col("__n").as("__nb"), col("cluster"))
    val dupIds = l.join(r, Seq("cluster")).filter(col("__a") < col("__b"))
      .withColumn("__cos",
        Similarity.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("__cos") >= tau)
      .select(col("__b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cluster"))
      .join(dupIds.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }
}
