package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-regression guard: the invariants PlanAudit eyeballs, asserted
  * (VERDICT r8 item 7). A future change that sneaks a cartesian
  * product, an entity-scale single-partition funnel, or an unpruned
  * scan into a scale-critical query fails HERE, in CI, not in the
  * round bench.
  *
  * Two classes of query:
  *  - declarative: the returned DataFrame IS the operator — its plan
  *    must be free of the 100-TB anti-patterns;
  *  - materialized (elite/gbt/auto families): the operator is a
  *    driver-orchestrated sequence of distributed jobs and the
  *    returned frame is an eager, entity-sized localCheckpoint — the
  *    invariant to pin is exactly that (a checkpoint scan, no live
  *    exchanges left in the result plan), while the internal stages
  *    are covered by the per-operator specs and SCALE.md soaks.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** A Window over an empty partition spec funnels every row through
    * ONE partition — the formatted plan renders it as a Sort/Window
    * below `Exchange SinglePartition`. Global AGGREGATES also exchange
    * to a single partition but carry only partial-agg rows, so the
    * check targets the Sort+Window shape, not bare exchanges. */
  private def hasGlobalWindowFunnel(plan: String): Boolean = {
    val lines = plan.linesIterator.toVector
    lines.indices.exists { i =>
      lines(i).contains("Exchange SinglePartition") &&
        lines.slice(math.max(0, i - 3), i).exists(_.contains("Window"))
    }
  }

  private val declarative = Seq(
    "q1_agg", "q2_join_agg", "q3_window_topk",
    "j_asof_backward", "j_range_band", "j_sessionize", "j_salted_join",
    "t_tfidf", "t_bm25", "t_pii", "t_langid", "t_gopher_rules",
    "t_perplexity_buckets",
    "d_minhash_lsh", "d_decontaminate", "d_semdedup", "d_url_dedup",
    "d_dsir_sample",
    "s_cosine_topk", "s_ann_ivf", "s_ann_pq",
    "pipe_corpus_clean", "pipe_curate_full",
    "fc_naive", "fc_linear_weighted", "m_score_backtest")

  // broadcast nested-loop IS legitimate for broadcast-SCALAR
  // enrichment — a ONE-ROW build side (corpus N/avgdl stats, the
  // cosine query vector, PQ codebook row) cross-joined onto every
  // row is a map-side enrich, not a pair blowup. These four carry
  // exactly that shape; everything else must be NLJ-free.
  private val scalarNlj = Set("t_tfidf", "t_bm25", "s_cosine_topk", "s_ann_pq")

  test("declarative queries: no cartesian product, no unintended nested-loop join") {
    declarative.foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"$name: cartesian product")
      if (!scalarNlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name: nested-loop join")
    }
  }

  test("declarative queries: no global-window single-partition funnel") {
    declarative.foreach { name =>
      val plan = planOf(name)
      assert(!hasGlobalWindowFunnel(plan), s"$name: global window funnel\n" +
        plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Window"))
          .mkString("\n"))
    }
  }

  test("q1_agg scan is pruned and filter-pushed (the canonical check)") {
    val plan = planOf("q1_agg")
    val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty)
    // lineitem is 16 columns wide; the aggregate needs a handful
    schemas.foreach { s =>
      val nCols = s.count(_ == ',') + 1
      assert(nCols <= 6, s"q1_agg reads too many columns: $s")
    }
  }

  test("d_decontaminate broadcasts the eval side (never shuffles the corpus against it)") {
    val plan = planOf("d_decontaminate")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "eval n-gram set should broadcast")
  }

  test("materialized forecaster families return eager checkpoints, not live plans") {
    // an entity-sized localCheckpoint scan: no exchanges remain in the
    // RESULT plan (all distributed work already ran, caches released)
    Seq("fc_elite_deep", "fc_elite_stack").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val live = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("ReusedExchange"))
      assert(live == 0, s"$name result should be a materialized checkpoint scan:\n" +
        plan.take(800))
      assert(df.rdd.partitions.nonEmpty)
    }
  }
}
