package graft

import graft.queries.Catalog
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale properties README claims
  * (pushdown, pruning, broadcast, top-k without global sort, no accidental
  * cartesians) asserted against the actual optimized plans, so a refactor
  * that silently loses them fails CI rather than a 100 TB run. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = GraftTestSpark.spark

  private def planOf(name: String): String = {
    val df = Catalog.queries(name)(spark, GraftTestSpark.Sf0001)
    df.queryExecution.executedPlan.toString
  }

  private def formattedPlanOf(name: String): String = {
    val df = Catalog.queries(name)(spark, GraftTestSpark.Sf0001)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("native scorers: classifier and entropy run as the fused expressions, not HOF chains") {
    // the round-11 codegen'd replacements must actually be in the plan —
    // a refactor that silently reverts to the interpreted HOF chains
    // costs 4-7x on the honest bench (SCALING.md round 11)
    val pc = planOf("quality_classifier")
    assert(pc.contains("linearscore("), pc)
    assert(!pc.contains("aggregate(") && !pc.contains("transform("), pc)
    val ps = planOf("secret_scan")
    assert(ps.contains("tokenentropy("), ps)
    val pf = planOf("quality_filter_chain")
    assert(pf.contains("linearscore("), pf)
  }

  test("filter_solr: predicate is pushed to the parquet scan") {
    val p = formattedPlanOf("filter_solr")
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(event_type,click)"), p)
  }

  test("project_columns: scan reads only the projected columns") {
    val p = formattedPlanOf("project_columns")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("event_id") && readSchema.contains("event_type") &&
      readSchema.contains("value") && !readSchema.contains("props") &&
      !readSchema.contains("user_id"), readSchema)
  }

  test("q3_join: dim broadcast, fact-fact stays a partitioned join, top-10 TakeOrdered") {
    val p = planOf("q3_join")
    assert(p.contains("BroadcastHashJoin"), p) // customer dim
    // the lineitem x reduced-orders join must NOT broadcast fact data:
    // partitioned shuffled-hash with the build on the semi-reduced side
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("topk: no global sort, TakeOrderedAndProject only") {
    val p = planOf("topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("+- Sort ["), p) // no full Sort node feeding the limit
  }

  test("q1_agg: partial aggregation before the exchange (map-side combine)") {
    val p = planOf("q1_agg")
    // plans print top-down: the partial_sum HashAggregate must sit BELOW
    // (after, in text) the hash-partitioning Exchange it feeds
    val exchange = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("partial_sum")
    assert(exchange >= 0 && partial > exchange, p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("dedup_minhash and salted_join: no nested-loop or cartesian joins") {
    Seq("dedup_minhash", "salted_join", "embedding_near_dup_lsh",
        "range_join", "dedup_incremental_near").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("scan_count: planned as metadata-friendly aggregate without wide scan") {
    val p = formattedPlanOf("scan_count")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
    // count(*) needs no data columns
    assert(readSchema.exists(s => s.contains("struct<>")), p)
  }

  test("salient_terms: the vocabulary (df) side is never broadcast") {
    // the document-frequency side IS the corpus vocabulary — unbounded on
    // a web corpus — so the tf x df join must stay a partitioned shuffle
    // join even where toy-scale stats would let Catalyst broadcast it
    val p = planOf("salient_terms")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"), p)
  }

  test("sample_reservoir: two-stage bottom-k, no per-stratum window, pruned exchange") {
    val p = planOf("sample_reservoir")
    // no window at all: neither global nor partitioned-by-stratum (a jumbo
    // stratum would funnel through one task)
    assert(!p.contains("Window"), p)
    // partial (map-side, no exchange below it) + final TopKPerKey stages
    assert("TopKPerKey".r.findAllMatchIn(p).size == 2, p)
    // the stratum exchange sits BETWEEN the stages (plans print top-down:
    // final above the exchange, partial below it), so it moves only the
    // k-per-partition survivors, never the corpus
    val finalIdx = p.indexOf("TopKPerKey")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(lang")
    val partialIdx = p.lastIndexOf("TopKPerKey")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, p)
  }

  test("scan_point_lookup: the IN-list prunes buckets at plan time") {
    val p = planOf("scan_point_lookup")
    // 4 keys over 16 buckets: at most 4 buckets selected, never all 16
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
    assert(m.isDefined, p)
    assert(m.get.group(1).toInt <= 4 && m.get.group(2).toInt == 16, p)
  }

  test("q7_nation_flows: one fact-fact shuffle join, every dimension broadcast") {
    val p = planOf("q7_nation_flows")
    assert(p.contains("ShuffledHashJoin"), p) // lineitem x orders
    // supplier, customer, and both nation aliases all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
  }

  test("bpe_fertility_by_lang: model-sized segment map broadcasts, corpus never shuffles pre-agg") {
    val p = planOf("bpe_fertility_by_lang")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("winsorize_by_group: broadcast cutoffs + narrow clip, no window over the events") {
    val p = planOf("winsorize_by_group")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p) // cutoffs come from the histogram pass
  }

  test("event_transitions: partial aggregation above the lag window, single pair shuffle") {
    val p = planOf("event_transitions")
    assert(p.contains("partial_count"), p) // map-side combine on (from, to)
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size <= 2, p)
  }

  test("join_bloom_reduce: the sketch probe sits below the join") {
    val p = planOf("join_bloom_reduce")
    val probe = p.indexOf("UDF")
    val join = p.indexOf("ShuffledHashJoin")
    assert(probe >= 0 && join >= 0 && probe > join, // plan prints top-down
      s"probe=$probe join=$join\n$p")
  }

  test("graph_pagerank: no cartesian/nested-loop joins in the iteration") {
    val p = planOf("graph_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_perplexity / _bigram: the vocabulary-sized count sides are never broadcast") {
    // same discipline as salient_terms: the n-gram-count sides ARE the
    // corpus vocabulary — unbounded on a web corpus — so the token x count
    // joins must stay partitioned; only the single-row totals may broadcast
    Seq("text_perplexity", "text_perplexity_bigram",
        "text_perplexity_kn", "text_perplexity_kn3",
        "text_perplexity_pretrained", "text_perplexity_pretrained3",
        "moore_lewis_select", "decontam_minkprob",
        "mixture_doremi_weights").foreach { q =>
      val p = planOf(q)
      assert(p.contains("ShuffledHashJoin"), s"$q:\n$p")
      assert(!p.contains("BroadcastHashJoin"), s"$q:\n$p")
    }
  }

  test("moore_lewis_select: ONE tokenize/explode feeds both model scores") {
    // the round-12 two-pass form re-tokenized, re-exploded, and
    // re-shuffled the SAME apply transitions once per model, then joined
    // the two per-doc frames back on the id; the shared-pass form has
    // exactly one Generate (the transition explode), one per-doc score
    // aggregation folding both micronat sums, and no doc-id join of two
    // scored frames
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val df = Catalog.queries("moore_lewis_select")(spark,
      GraftTestSpark.Sf0001)
    val plan = df.queryExecution.optimizedPlan
    // no explode outside the shared persisted transition frame...
    assert(plan.collect { case g: Generate => g }.isEmpty, plan.toString)
    // ...and every cache reference is the SAME relation (the one
    // transition frame, read by the type scoring and the join-back)
    val caches = plan.collect { case r: InMemoryRelation => r.cacheBuilder }
    assert(caches.nonEmpty && caches.distinct.size == 1, plan.toString)
    // one per-doc score aggregation folding both micronat sums
    val p = df.queryExecution.executedPlan.toString
    assert("partial_count\\(1\\)".r.findAllIn(p).size == 1, p)
  }

  test("dedup_exact_rows: partial min_by aggregate keyed by digest, no window") {
    // an exact-dup clique (one boilerplate text x 10^8 copies) must never
    // funnel through one task: the digest-keyed window is banned, and the
    // partial min_by stage must sit below the digest exchange so only one
    // row per digest per partition ever shuffles (hash aggregate = spill
    // support, which matters because digest cardinality ~ row count)
    val p = planOf("dedup_exact_rows")
    assert(!p.contains("Window"), p)
    // the digest alias inlines to _groupingexpression in the aggregate plan
    val exchange = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("partial_min_by")
    assert(exchange >= 0 && partial > exchange, p)
  }

  test("dedup_cap: two-stage heap keyed by digest, no window") {
    // same clique discipline for the keep-k form: the partial TopKPerKey
    // stage keeps k rows per digest per partition before the exchange
    val p = planOf("dedup_cap")
    assert(!p.contains("Window"), p)
    assert("TopKPerKey".r.findAllMatchIn(p).size == 2, p)
    val finalIdx = p.indexOf("TopKPerKey")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(_digest")
    val partialIdx = p.lastIndexOf("TopKPerKey")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, p)
  }

  test("tokenize_ids: the vocab id-mapping is a broadcast join (corpus never shuffles for it)") {
    val p = planOf("tokenize_ids")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("decontaminate_bloom: sketch prefilter feeds a broadcast verify join") {
    val p = planOf("decontaminate_bloom")
    assert(p.contains("BroadcastHashJoin"), p) // exact-string verify side
    // the bloom probe (the only UDF in the engine's bench surface) sits on
    // the exploded stream as a plain filter — present in the plan
    assert(p.contains("UDF") || p.contains("mightContain"), p)
  }

  test("seq_concat_blocks: the cumsum window is partitioned by the hash bucket") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Catalog.queries("seq_concat_blocks")(spark, GraftTestSpark.Sf0001)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("winnow pairs: clique-collapsed — winnowing and the DP run at distinct-text level") {
    // the round-10 clique collapse: winnowing, the fp self-join, and (edit
    // mode) the Levenshtein DP are keyed by md5 content groups, so a clique
    // of c exact-duplicate docs costs 1x, not c²x. Pinned properties:
    //  - the winnow Generate's retained child output is the content group
    //    `_g`, never a doc id (the cached reps plan reprints at every scan
    //    site, so this is a per-line shape check, not an occurrence count);
    //  - the Levenshtein runs over the group-level prefix columns
    //    (_pa/_pb), never doc-level text;
    //  - both aggregates partial-combine below their exchange (reps' min
    //    and the shared-fp count), so duplicate texts collapse map-side;
    //  - no cartesian/nested-loop anywhere in the pair machinery.
    // round-11: the collapse is ADAPTIVE (measured dup factor vs the
    // 1.3 threshold; callers can force it) — pin the collapsed shape on
    // the FORCED form, then pin that auto picks the raw doc-keyed plan
    // on the dup-free fixture corpus
    val docs = graft.sources.Tables.documents(spark, GraftTestSpark.Sf0001)
    Seq(false, true).foreach { withEdit =>
      val q = if (withEdit) "dedup_edit_verify(forced)" else "winnow_overlap_pairs(forced)"
      val df =
        if (withEdit) graft.functions.TextAnalysis.editVerifiedPairs(docs, "doc_id", "text",
          collapseCliques = Some(true))
        else graft.functions.TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text",
          collapseCliques = Some(true))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      val winnowLines =
        p.linesIterator.filter(_.contains("explode(winnow_select")).toSeq
      assert(winnowLines.nonEmpty &&
        winnowLines.forall(l => l.contains("[_g#") && !l.contains("doc_id")),
        s"$q:\n$p")
      val levLines =
        p.linesIterator.filter(_.contains("levenshtein(")).toSeq
      assert(levLines.nonEmpty == withEdit &&
        levLines.forall(l => l.contains("_pa#") && l.contains("_pb#")),
        s"$q:\n$p")
      val minExchange = p.indexOf("Exchange hashpartitioning(_g#")
      val partialMin = p.indexOf("partial_min")
      assert(minExchange >= 0 && partialMin > minExchange, s"$q:\n$p")
      val cntExchange = p.indexOf("Exchange hashpartitioning(_ga#")
      val partialCnt = p.indexOf("partial_count")
      assert(cntExchange >= 0 && partialCnt > cntExchange, s"$q:\n$p")
    }
    // the catalog gates run in auto mode: on the dup-free fixture the
    // measured factor is ~1.0, so the plan must be the doc-keyed raw
    // shape — no content-group machinery, winnowing keyed by doc_id
    Seq("winnow_overlap_pairs" -> false, "dedup_edit_verify" -> true)
      .foreach { case (q, withEdit) =>
        val p = planOf(q)
        assert(!p.contains("CartesianProduct"), s"$q:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
        val winnowLines =
          p.linesIterator.filter(_.contains("explode(winnow_select")).toSeq
        assert(winnowLines.nonEmpty &&
          winnowLines.forall(l => !l.contains("[_g#")), s"$q:\n$p")
        assert(p.contains("levenshtein(") == withEdit, s"$q:\n$p")
        val cntExchange = p.indexOf("Exchange hashpartitioning(id_a#")
        val partialCnt = p.indexOf("partial_count")
        assert(cntExchange >= 0 && partialCnt > cntExchange, s"$q:\n$p")
      }
  }

  test("cdc_chunks: the inferred generate filter never re-evaluates the boundary expression") {
    // the InferFiltersFromGenerate trap (SCALING.md round-10): without
    // the persist barrier, `size(_b) > 0` is pushed into the scan with
    // the whole boundary lambda inlined — 50x the query's real work.
    // Pin: no Filter line in the executed plan carries a lambda.
    val p = planOf("cdc_chunks")
    val offending = p.linesIterator
      .filter(l => l.contains("Filter") && l.contains("lambdafunction"))
    assert(offending.isEmpty, p)
  }

  test("catalog hygiene: unique names; every oracle names every output column") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct)}")
    // the driver's compare sorts columns BY NAME before hashing — an
    // aliased Spark column missing from the oracle text is the classic
    // silent schema-mismatch; catch it before the gate does
    Catalog.all.foreach { d =>
      val cols = d.fn(spark, GraftTestSpark.Sf0001).columns
      val oracleText = d.oracle
        .orElse(d.dynOracle.map(f => f(spark, GraftTestSpark.Sf0001)))
      oracleText.foreach { sql =>
        val lower = sql.toLowerCase
        cols.foreach(c => assert(lower.contains(c.toLowerCase),
          s"${d.name}: oracle SQL never mentions output column '$c'"))
      }
    }
  }

  /** Queries whose OPTIMIZED plans legitimately retain a join with no
    * condition: the perplexity scorers broadcast their ONE-ROW vocabulary
    * total into every scored row. Every other apparent cross product in
    * the catalog (bounded pair generators written as
    * `crossJoin(...).filter(a < b)`) leaves the optimizer as a
    * CONDITIONED join — the filter becomes the join predicate — which is
    * exactly what this guard verifies. */
  private val BoundedCrossProductQueries = Set(
    // text_perplexity/_bigram left the allowlist in round 7: their
    // score-join frames are persisted (materialized by the internal cutoff
    // action), so the single-row totals cross join hides behind the
    // InMemoryRelation like ccnet_lang_buckets before them
    // broadcast of a metadata-sized side by construction: the bench/eval
    // embedding set (decontam) and the fixed threshold list (pr curve);
    // bitext mining broadcasts one language shard of the mining batch
    // (IVF-cell blocking is the full-scale candidate path).
    // ccnet_lang_buckets left the allowlist in round 7: its scored frame
    // is persisted, so the inherited single-row totals join now hides
    // behind the InMemoryRelation and the optimized plan is clean
    "decontam_semantic", "classifier_pr_curve",
    // the trained table's ONE-ROW bias (bucket -1) rides a broadcast
    // crossJoin onto the per-doc scores — bounded by construction
    "classifier_train_apply",
    "bitext_margin_mine",
    // ONE-ROW broadcast totals: the recall report joins its two count
    // aggregates (Dedup.scala:921-922), the salting advisor joins the
    // table-total count (Stats skewAdvisor), and basket affinity joins
    // the n_baskets total (the constant `_one` key folds away) into
    // sketch-sized frames
    "lsh_recall_report", "skew_salting_advisor", "basket_pair_affinity",
    // the embargo split joins its 1-row min/max bounds aggregate (the
    // constant `_one` key folds away like basket's)
    "split_temporal_embargo",
    // freshness joins the ONE-ROW global-max aggregate onto the per-group
    // maxes (explicit crossJoin of a broadcast 1-row frame)
    "events_freshness",
    // pretrained-LM scoring crossJoins the ONE-ROW (nb, vc) smoothing
    // totals of the TRAIN type table — the same single-row-totals seat as
    // events_freshness; unlike text_perplexity/_bigram there is no
    // internal persist to hide it behind (the apply side is scored in one
    // uncached pass), so it stays allowlisted by design
    "text_perplexity_pretrained",
    // trigram pretrained: same ONE-ROW (nbp, vc3) smoothing-totals
    // crossJoin as the bigram form
    "text_perplexity_pretrained3",
    // min-K% score: the same landed-LM one-row smoothing-totals crossJoin
    "decontam_minkprob",
    // DoReMi weights: TWO one-row broadcast totals (corpus mean NLL, the
    // exp normalizer) onto a |domains|-row frame
    "mixture_doremi_weights",
    // Moore-Lewis: ONE shared apply pass carrying BOTH models' one-row
    // smoothing-totals crossJoins
    "moore_lewis_select",
    // (round 17) the Viterbi/FFBS kernels removed segmentWith's and
    // sampleSegments' operator persists (the interpreted-HOF barriers
    // the codegen'd kernels no longer need), so scoresOf's ONE-ROW
    // vocab-total crossJoin — always in the code — is no longer hidden
    // behind an InMemoryRelation in these two plans
    "tokenize_unigram_viterbi", "unigram_sample_segments")
    // (round 17) unigram_learn_soft LEFT the allowlist: its scoresOf
    // crossJoin of the ONE-ROW vocab total is still in the code, but —
    // like unigram_learn behind learnSegment — it now hides behind
    // unigram_segment_soft's whole-plan persist of the same learnSoft
    // frame, so the optimized plan this spec reads is clean.

  test("no unconditioned join outside the documented bounded set") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val offenders = Catalog.all.flatMap { d =>
      val plan = d.fn(spark, GraftTestSpark.Sf0001).queryExecution.optimizedPlan
      val free = plan.collect { case j: LJoin if j.condition.isEmpty => j }
      if (free.nonEmpty) Some(d.name) else None
    }.toSet
    assert(offenders == BoundedCrossProductQueries,
      s"unexpected: ${offenders -- BoundedCrossProductQueries}; " +
        s"allowlisted but clean: ${BoundedCrossProductQueries -- offenders}")
  }

  /** The documented reference-parity operators that model an inherently
    * sequential counter (the reference's global page/WRR state). Each has a
    * scale-path sibling in the catalog; nothing else may plan a
    * single-partition window. */
  private val GlobalWindowParityQueries = Set(
    "scan_resume", "sink_kafka_shape",
    "partition_rr_basic", "partition_rr_smooth", "partition_rr_weighted",
    // bounded-by-construction single-partition windows over METADATA:
    // the funnel's step-over-step rate runs over k funnel steps
    // (Funnel.scala "k-row frame"), RRF's final rank runs over the fused
    // pool of lists x K rows, and the latency sketch's cumulative walk
    // runs over <= ~1K bucket counts (its constant g='all' partition key
    // folds away) — all sketch-sized, never the corpus.
    // token_zipf_slope left the allowlist in round 9: the ranking is now
    // a top-fitK head fit (TakeOrdered + bounded driver math — no window)
    "events_funnel_steps", "hybrid_search_rrf", "funnel_conversion_latency")

  test("events_freshness: only the 1-row global max rides the broadcast " +
    "nested loop; both sides are partial-aggregated") {
    val p = planOf("events_freshness")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_max"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("event_next_markov_accuracy: the |types|^2 model broadcasts back; " +
    "per-user windows only, no cartesian") {
    val p = planOf("event_next_markov_accuracy")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("round-10 relational batch: cube/unpivot are an Expand into ONE " +
    "partial-agg exchange; pivot aggregates with no collect job; the " +
    "interval and distribution windows are key-partitioned, never global") {
    val cube = planOf("agg_cube_lang_source")
    assert(cube.contains("Expand") && cube.contains("partial_count"), cube)
    assert("Exchange hashpartitioning".r.findAllIn(cube).size == 1, cube)
    val unp = planOf("unpivot_metrics")
    assert(unp.contains("Expand") && unp.contains("partial_min"), unp)
    assert("Exchange hashpartitioning".r.findAllIn(unp).size == 1, unp)
    // explicit pivot values -> partial-aggregable pivotfirst, and the
    // data-dependent collect-distinct job the implicit form runs never
    // exists (the plan is built without any prior action)
    val piv = planOf("events_pivot_daily")
    assert(piv.contains("partial_pivotfirst"), piv)
    val rf = planOf("events_range_frame_sum")
    assert(rf.contains("specifiedwindowframe(RangeFrame, -1800000000"), rf)
    assert(rf.contains("windowspecdefinition(user_id"), rf)
    val wd = planOf("window_distribution_funcs")
    assert(wd.contains("windowspecdefinition(event_type"), wd)
  }

  test("seq_span_corrupt: per-doc windows only — no join, no global window") {
    val p = planOf("seq_span_corrupt")
    assert(!p.contains("Join"), p)
  }

  test("user_erasure_audit: the erasure list rides a broadcast; the event " +
    "log never self-joins on data") {
    val p = planOf("user_erasure_audit")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("attribution_last_touch: per-user window only — no join at all") {
    val p = planOf("attribution_last_touch")
    assert(!p.contains("Join"), p)
  }

  test("events_dow_seasonal: slot baselines broadcast back onto the " +
    "daily-count frame; no global window") {
    val p = planOf("events_dow_seasonal")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("embedding_dim_drift: one dims-keyed partial aggregate + " +
    "TakeOrdered — no sort of the exploded frame, no join") {
    val p = planOf("embedding_dim_drift")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join"), p)
    // partial aggregation before the exchange: the exploded components
    // combine map-side, so the shuffle carries dim-keyed sums
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("hll_rolling_sparse: sketch-sized day list broadcasts; no cartesian") {
    val p = planOf("hll_rolling_sparse")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_rolling_distinct: day list broadcasts; the deduped frame " +
    "never cartesians") {
    val p = planOf("events_rolling_distinct")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_rolling_distinct_hll: sketch merge joins against a " +
    "broadcast day list, no cartesian") {
    val p = planOf("events_rolling_distinct_hll")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("image_dhash_near_dup: block-keyed equi-joins only — no cartesian, " +
    "no broadcast of the corpus side") {
    val p = planOf("image_dhash_near_dup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("basket_pair_affinity: item-count sides broadcast-hash; only the " +
    "1-row total rides a nested-loop broadcast; no cartesian") {
    val p = planOf("basket_pair_affinity")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_cusum_changepoint: one partial-aggregated daily-count " +
    "shuffle; no joins at all") {
    val p = planOf("events_cusum_changepoint")
    val exchange = p.indexOf("Exchange hashpartitioning")
    val partial = p.indexOf("partial_count")
    assert(exchange >= 0 && partial > exchange, p)
    assert(!p.contains("Join"), p)
  }

  test("retrieval_mrr: the metadata-sized query set broadcast-builds " +
    "(non-equi exclusion forces nested-loop, like hard_negatives); " +
    "TopKPerKey prunes before the qid shuffle; no cartesian") {
    val p = planOf("retrieval_mrr")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("session_paths: per-user windows only — no self-join of the " +
    "event stream") {
    val p = planOf("session_paths")
    assert(!p.contains("Join"), p)
  }

  test("no single-partition WindowExec outside the documented parity set") {
    // collected from the optimized logical plan: AQE wraps the physical one
    // in AdaptiveSparkPlanExec, which hides its subtree from collect
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = Catalog.all.flatMap { d =>
      val plan = d.fn(spark, GraftTestSpark.Sf0001).queryExecution.optimizedPlan
      val global = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty) Some(d.name) else None
    }.toSet
    assert(offenders == GlobalWindowParityQueries,
      s"unexpected global-window queries: ${offenders -- GlobalWindowParityQueries}; " +
        s"missing expected: ${GlobalWindowParityQueries -- offenders}")
  }
}
