package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: the properties PERF.md records (pushdown
  * reaching the scan, top-k without a global sort, partial+final
  * aggregation, no quadratic joins in blocked paths) asserted from the
  * physical plan text, so a refactor that silently loses one fails CI,
  * not the 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestBase._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_filter_range pushes its predicates into the parquet scan") {
    val p = plan("q_filter_range")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,30.0)"), p)
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q_topk", "q_knn", "q_knn_cosine", "q_ship_priority", "q_uniform_k")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost its top-k plan:\n$p")
    }
  }

  test("q1_agg aggregates partial then final (map-side combine)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("blocked pair scans contain no cartesian product") {
    for (q <- Seq("q_cosine_blocked", "q_jaccard_pairs", "q_minhash_dedup",
      "q_entity_match", "q_hard_negatives", "q_bitext_mine", "q_containment")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went quadratic:\n$p")
    }
  }

  test("q_phrase_search filters postings to phrase terms before any exchange") {
    val p = plan("q_phrase_search")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the term isin filter must sit below the first exchange: the filter
    // appears in the plan and the phrase join is (doc_id, pos)-keyed
    assert(p.contains("term"), p)
    assert(p.contains("pos"), p)
  }

  test("q_hard_negatives and q_bitext_mine keep rank-limit pruning (WindowGroupLimit)") {
    for (q <- Seq("q_hard_negatives", "q_bitext_mine")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost per-partition rank pruning before the exchange:\n$p")
    }
  }

  test("q_cosine_blocked joins pairs on the cell key") {
    val p = plan("q_cosine_blocked")
    // the id_a < id_b condition must ride on a cell equi-join
    assert(p.contains("cell"), p)
    assert(p.contains("(id_a"), p)
  }

  test("q_salted_join shuffles on the (key, salt) compound, never a broadcast") {
    val p = plan("q_salted_join")
    assert(p.contains("hashpartitioning"), p)
    assert(p.contains("_salt"), s"join not keyed by the salt column:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"dim side broadcast — the salt exchange was optimized away:\n$p")
  }

  test("q_ann_hnsw2 re-ranks candidates via broadcast + top-k, no corpus shuffle") {
    val p = plan("q_ann_hnsw2")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate ids must broadcast back onto the corpus scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"re-rank lost its top-k plan:\n$p")
  }

  test("corpus-analytics joins broadcast their vocab-bounded side") {
    // the count/df/bench-gram tables are bounded by vocabulary, not corpus
    // size — at 100 TB these joins must NOT shuffle the exploded-token side
    for (q <- Seq("q_surprisal", "q_tfidf_terms", "q_decontaminate")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q shuffles the token stream instead of broadcasting the vocab side:\n$p")
    }
  }

  test("q_tfidf_terms prunes rank>K before the window exchange") {
    val p = plan("q_tfidf_terms")
    assert(p.contains("WindowGroupLimit"),
      s"per-partition top-K pruning (WindowGroupLimit) lost:\n$p")
  }

  test("q_retention self-join is an equi-join on (user, day)") {
    val p = plan("q_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"retention join degraded to a product:\n$p")
  }

  test("q_kmeans assignment is row-local: no exchange between corpus scan and argmin") {
    val p = plan("q_kmeans")
    assert(p.contains("InMemoryTableScan"),
      s"corpus re-read from parquet instead of the persisted cache:\n$p")
    // centroids are plan literals: the assignment needs NO join and NO
    // window — the only hash exchange left is the k-row cluster report agg
    assert(!p.contains("Join"), s"assignment re-grew a centroid join:\n$p")
    assert(!p.contains("Window"), s"assignment re-grew the argmin window:\n$p")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one exchange (the final cluster agg):\n$p")
  }

  test("q_projection reads only the projected columns") {
    val p = plan("q_projection")
    assert(p.contains("ReadSchema"), p)
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("o_totalprice"), s"unpruned scan: $read")
  }

  test("q_group_normalize broadcasts the 5-group stats onto the doc stream") {
    val p = plan("q_group_normalize")
    assert(p.contains("BroadcastHashJoin"),
      s"per-lang stats not broadcast — doc stream would co-shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"), s"doc stream shuffled for a 5-row dim:\n$p")
  }

  test("q_sliding_features is one window pass - no join, one user-keyed shuffle") {
    val p = plan("q_sliding_features")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"point-in-time features must not self-join:\n$p")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length >= 1, p)
  }

  test("q_random_projection is a shuffle-free scan (signs are plan literals)") {
    val p = plan("q_random_projection")
    assert(!p.contains("Join"), p)
    // only the final presentation sort may exchange; no hash shuffle at all
    assert(!p.contains("hashpartitioning"),
      s"projection pass should not shuffle:\n$p")
    assert(!p.contains("md5"), s"sign matrix recomputed per row instead of folded:\n$p")
  }

  test("q_bloom_decontaminate broadcasts the fixed-size bit set") {
    val p = plan("q_bloom_decontaminate")
    // pin the POS-keyed join specifically: the exact companion's bench-gram
    // join also broadcasts, so a bare BroadcastHashJoin check is vacuous
    assert("BroadcastHashJoin \\[pos#".r.findFirstIn(p).isDefined,
      s"bit set not broadcast onto the probe stream on the pos key:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pq_adc is a join-free literal-codebook scan ending in top-k") {
    val p = plan("q_pq_adc")
    // codebook + probe tables are plan literals: encode + ADC must be one
    // scan — any Join node means a table crept back into the hot path
    assert(!p.contains("Join"), s"PQ scan re-grew a join:\n$p")
    assert(!p.contains("hashpartitioning"), s"PQ scan should not shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost:\n$p")
  }

  test("q_inverted_index caps posting lists before the window exchange") {
    val p = plan("q_inverted_index")
    assert(p.contains("WindowGroupLimit"),
      s"posting cap (WindowGroupLimit partial top-N) lost:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_bm25 broadcasts query terms and df onto the postings stream") {
    val p = plan("q_bm25")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"query-term / df joins not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost:\n$p")
  }

  test("q_substring_dup shuffles on the window key, never a product") {
    val p = plan("q_substring_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("InMemoryTableScan"),
      s"exploded window stage re-built per consumer instead of persisted:\n$p")
  }

  test("q_hash_split is one partial+final agg over a 2-column scan") {
    val p = plan("q_hash_split")
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"split report lost its map-side combine:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"scan reads more than the 3 needed columns:\n$p")
  }

  test("q_nb_lang broadcasts the model tables onto the token stream") {
    val p = plan("q_nb_lang")
    // term (w, cand, s) and pri (cand, lp) are vocab×classes-bounded:
    // the scoring side must never shuffle the token stream against them
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_winnow joins df-capped postings on the fingerprint key") {
    val p = plan("q_winnow")
    // selection is row-local: the persisted fingerprint stage is reused
    // by the df-cap agg and both pair-join sides
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_bpe_merges scans the corpus exactly once (vocab-bounded loop)") {
    // the word-frequency agg is the only corpus-scale stage; every merge
    // round runs on the checkpointed vocab frame — documents.parquet must
    // appear in the final plan zero times (checkpoint) and the pair agg
    // must be partial+final
    val p = plan("q_bpe_merges")
    assert(!p.contains("documents.parquet"),
      s"merge output should derive from checkpointed vocab, not rescan:\n$p")
  }

  test("q_kcore_big peels node-keyed off the persisted edge set, no product") {
    // the only Window allowed is coEdges' lead() chain construction; the
    // peel itself must be joins + agg off the persisted undirected edges
    val p = plan("q_kcore_big")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("InMemoryTableScan"), s"edge set not persisted:\n$p")
    // the final deg agg must be partial+final keyed on the node id
    assert(p.contains("partial_count"), p)
  }

  test("q_char_entropy is one scan into map-combined histogram aggs: no join") {
    // histogram rendering (round 12): explode → partial+final agg per
    // (doc, char) → decimal term → per-doc agg → sort. The partial agg is
    // load-bearing — it bounds the shuffle to ~|alphabet| rows per doc.
    // (Replaced the row-local interpreted aggregate() fold: same exact
    // decimal totals, 3.0 → 1.3 s warm at sf0.1 — PERF.md round 12.)
    val p = plan("q_char_entropy")
    assert(!p.toLowerCase.contains("join"), s"entropy must not join:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 3,
      s"two agg exchanges + the orderBy only:\n$p")
    assert(p.contains("partial_count"),
      s"char histogram must map-side combine before the shuffle:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one documents scan only:\n$p")
  }

  test("q_mm_features decodes in one mapPartitions pass over a single scan") {
    val p = plan("q_mm_features")
    assert(!p.toLowerCase.contains("join"), s"feature lanes must not join:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one documents scan only:\n$p")
    assert(p.contains("MapPartitions"), s"typed decode boundary missing:\n$p")
  }

  test("q_audio_features frames inside one mapPartitions scan, no shuffle but the sort") {
    val p = plan("q_audio_features")
    assert(!p.toLowerCase.contains("join"), s"framing must not join:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one documents scan only:\n$p")
    assert(p.contains("MapPartitions"), s"typed decode boundary missing:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 1,
      s"only the final orderBy exchange is allowed:\n$p")
  }

  test("q_link_predict ranks top-K without a global sort and never goes quadratic") {
    val p = plan("q_link_predict")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-K lost its K-row merge:\n$p")
    assert(p.contains("InMemoryTableScan"), s"undirected edge set not persisted:\n$p")
  }

  test("q_ewma groupBy reuses the window's user-keyed exchange") {
    // window partitionBy(user) then groupBy(user): ONE hash exchange on
    // user_id plus the final orderBy range exchange — a second user
    // shuffle means the reuse regressed
    val p = plan("q_ewma")
    assert(!p.toLowerCase.contains("join"), s"ewma must not join:\n$p")
    assert("hashpartitioning".r.findAllIn(p.toLowerCase).length <= 2,
      s"groupBy lost the window's partitioning:\n$p")
  }

  test("q_group_k plans per-group top-K as WindowGroupLimit") {
    val p = plan("q_group_k")
    assert(p.contains("WindowGroupLimit"),
      s"per-source rank lost its partial top-K:\n$p")
  }

  test("q_span_corrupt is a row-local scan (hash geometry, no shuffle but the sort)") {
    val p = plan("q_span_corrupt")
    // match join OPERATORS, not the string-function array_join in the projection
    assert(!"(?i)(HashJoin|MergeJoin|NestedLoop|CartesianProduct)".r
      .findFirstIn(p).isDefined, s"span corruption must not join:\n$p")
    assert("FileScan".r.findAllIn(p).length == 1, s"one documents scan only:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 1,
      s"only the final orderBy exchange is allowed:\n$p")
  }

  test("q_knn_join broadcasts probes and caps per-query rows before the exchange") {
    val p = plan("q_knn_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"probe set must broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k lost its partial limit:\n$p")
  }

  test("q_kmv_overlap reduces shards to bounded sketches before the 1x1 algebra") {
    val p = plan("q_kmv_overlap")
    // the udaf aggregates partial -> final (ObjectHashAggregate pair), so
    // the shuffle carries <=K longs per shard, never the raw hash stream
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"bottom-K sketch not partial-aggregated:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_anti_join broadcasts the 1-row threshold and anti-joins on custkey") {
    val p = plan("q_anti_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"threshold row must broadcast-cross, not partition:\n$p")
    assert(p.contains("LeftAnti"), s"anti join lost:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_semi_join plans a left-semi (probe stops at first match, no dedup stage)") {
    val p = plan("q_semi_join")
    assert(p.contains("LeftSemi"), s"semi join lost:\n$p")
    // a rewrite through inner-join+distinct would add an extra aggregate
    // and duplicate-then-dedupe the fact stream
    assert(!p.toLowerCase.contains("distinct"), s"semi became join+distinct:\n$p")
  }

  test("q_small_order aggregates per part partial+final before rejoining the fact") {
    val p = plan("q_small_order")
    assert(p.contains("partial_sum"), s"per-part agg lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_event_paths caps each user's events as WindowGroupLimit before pathing") {
    val p = plan("q_event_paths")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=N filter not pushed into the window:\n$p")
  }

  test("q_zipf_slope collapses to vocab counts and fits on a top-K frame") {
    val p = plan("q_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-$ZIPF_TOP_MSG terms must heap-select, not globally sort the vocab:\n$p")
    assert(p.contains("partial_count"), s"term counts lost map-side combine:\n$p")
  }

  private val ZIPF_TOP_MSG = operators.CorpusOps.ZIPF_TOP

  test("q_entity_match persists the verified pairs so the sort's sampling pass reuses them") {
    val p = plan("q_entity_match")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"pair verify re-executes under RangePartitioning sampling:\n$p")
  }

  test("q_ab_test reduces the event stream in one partial+final agg, no joins") {
    val p = plan("q_ab_test")
    assert(p.contains("partial_"), s"conditional moments lost map-side combine:\n$p")
    assert(!p.toLowerCase.contains("join"), s"the 6-moment pass grew a join:\n$p")
  }

  test("q_cum_revenue windows run over the aggregated daily frame, not raw orders") {
    val p = plan("q_cum_revenue")
    // the partial+final agg must appear BELOW the window operator
    val wIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("partial_sum")
    assert(wIdx >= 0 && aggIdx >= 0 && aggIdx > wIdx,
      s"expected Window above (executing after) the partial agg in the plan tree:\n$p")
  }

  test("q_mm_phash is one typed mapPartitions scan, no join, no generator") {
    val p = plan("q_mm_phash")
    assert(p.contains("SerializeFromObject"), s"typed decode boundary lost:\n$p")
    assert(!p.toLowerCase.contains("join"), p)
    assert(!p.contains("Generate"), p)
  }

  test("q_dup_ratio shuffles digests for the exact distinct, never document text") {
    val p = plan("q_dup_ratio")
    assert(p.contains("md5"), s"content key lost:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"exact distinct lost its partial stage:\n$p")
  }

  test("q_profile is ONE table scan: multi-distinct via Expand, no per-column rescans") {
    val p = plan("q_profile")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"profile must read the table once:\n$p")
    assert(p.contains("Expand"), s"multi-distinct lost its Expand rendering:\n$p")
    assert(!p.toLowerCase.contains("join"), s"profile needs no join:\n$p")
  }

  test("q_profile_wide is one scan + one Generate, codegen aggs — no Expand, no object agg") {
    val p = plan("q_profile_wide")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"wide profile must read lineitem once:\n$p")
    assert("Generate".r.findAllIn(p).length == 1,
      s"exactly one unpivot Generate:\n$p")
    assert(!p.contains("Expand"),
      s"the Expand multi-distinct form measured 38.8 s (mode() forced an " +
        s"ObjectHashAggregate over the x12 stream) — must stay unpivot-count:\n$p")
    assert(!p.contains("ObjectHashAggregate"),
      s"aggregates must stay codegen HashAggregates:\n$p")
    assert(!p.toLowerCase.contains("join"), s"profile needs no join:\n$p")
  }

  test("privacy audits read one pruned scan and aggregate partial-then-final") {
    for (q <- Seq("q_k_anonymity", "q_l_diversity")) {
      val p = plan(q)
      assert("Scan parquet".r.findAllIn(p).length == 1,
        s"$q must read customer once:\n$p")
      val read = p.linesIterator.find(_.contains("ReadSchema")).get
      assert(!read.contains("c_name") && !read.contains("c_address") &&
        !read.contains("c_comment"), s"$q unpruned scan: $read")
      assert(p.contains("partial_"), s"$q lost map-side combine:\n$p")
      assert(!p.toLowerCase.contains("sortmergejoin"),
        s"$q shuffled a join for a bounded rollup:\n$p")
    }
    // t-closeness legitimately joins the cell frame against its own
    // QI-bounded rollups — but only as broadcasts, never a shuffled join
    val p = plan("q_t_closeness")
    assert(!p.toLowerCase.contains("sortmergejoin") &&
      !p.contains("CartesianProduct"),
      s"q_t_closeness must join its bounded rollups broadcast-side:\n$p")
    assert(p.contains("partial_"), s"q_t_closeness lost map-side combine:\n$p")
  }

  test("q_chi2 and q_ddsketch prune the document scan to their columns") {
    for ((q, banned) <- Seq(
        "q_chi2" -> Seq("text", "n_chars", "doc_id"),
        "q_ddsketch" -> Seq("text", "source", "doc_id"))) {
      val p = plan(q)
      val read = p.linesIterator.find(_.contains("ReadSchema")).get
      banned.foreach(c =>
        assert(!read.contains(c), s"$q reads unneeded column $c: $read"))
    }
  }

  test("q_ks_test: corpus-scale work ends at the two count aggs (no corpus window)") {
    val p = plan("q_ks_test")
    // both ECDF windows must run over aggregated frames, so every Window's
    // child chain contains an aggregate, never a raw corpus scan
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"count aggs lost map-side combine:\n$p")
  }

  test("q_hyperanf round: register max-merge is an equi-join + partial/final agg") {
    // qHyperAnf's rounds execute EAGERLY (the curve readout forces each
    // frame), so the gate's returned 5-row plan can't be pinned — pin the
    // factored round builder instead, fed by the gate's own inputs.
    import org.apache.spark.sql.functions._
    val e = operators.BigGraphOps.coEdges(spark, sfDir)
    val und = e.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    val regs = operators.SketchOps.hllRegistersAt(
      und.select(col("a").as("node")).distinct()
        .select(col("node"),
          graft.functions.Fns.hash32(
            concat(lit("anf_"), col("node").cast("string"))).as("h")),
      "node", operators.BigGraphOps.ANF_BITS)
    val p = operators.BigGraphOps.anfRound(und, regs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"register merge went non-equi:\n$p")
    assert(p.contains("partial_max"),
      s"max-merge lost map-side combine:\n$p")
    assert(p.contains("bucket"),
      s"agg no longer keyed by (node, bucket):\n$p")
  }

  test("q_hyperanf executes rounds over persisted registers behind a lineage cut") {
    // Runtime pin via QueryExecutionListener: each round's readout plan
    // must show (a) the register max-merge agg actually executing, (b) the
    // previous round scanned as a flat ExistingRDD (the lineage cut — a
    // recursive plan would OOM the driver at depth), (c) InMemoryTableScan
    // (the persisted edge/register posture).
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    import scala.jdk.CollectionConverters._
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      SparkEntry.queries("q_hyperanf")(spark, sfDir).collect()
      // the listener bus is async — poll until the round plans arrive
      def all() = captured.asScala.mkString("\n===\n")
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
        !(all().contains("partial_max") && all().contains("ExistingRDD")))
        Thread.sleep(100)
      val a = all()
      assert(a.contains("partial_max"),
        s"no captured plan shows the register max-merge executing:\n$a")
      assert(a.contains("ExistingRDD"),
        s"no captured plan reads the lineage-cut LogicalRDD view:\n$a")
      assert(a.contains("InMemoryTableScan"),
        s"no captured plan scans a persisted frame:\n$a")
    } finally spark.listenerManager.unregister(l)
  }
}
