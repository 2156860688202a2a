package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

/** Plan-shape regression tests for the headline queries: the README's
  * "pushdown and pruning verified, not assumed" as enforced assertions
  * rather than a manual `graft.Explain` read-through.
  *
  * AQE is disabled within each check: these assertions pin the STATIC
  * plan (what Catalyst resolves before runtime re-planning) — column
  * pruning into the parquet scans, join strategies, shuffle counts.
  * AQE only ever coalesces/re-plans at runtime; the static shape is what
  * must be right for the 100 TB story.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def staticPlan(df: => DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case s: FileSourceScanExec => s }
  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case s: ShuffleExchangeExec => s }

  test("edge derivation prunes both parquet scans to the used columns") {
    val p = staticPlan(model.Tables.edges(spark, dir))
    val byTable = scans(p).map(s =>
      s.relation.location.rootPaths.head.getName -> s.requiredSchema.names.toSet)
    assert(byTable.size == 2, s"expected 2 scans, got $byTable")
    val m = byTable.toMap
    assert(m("orders.parquet") == Set("o_orderkey", "o_custkey", "o_orderdate"),
      s"orders scan not pruned: ${m("orders.parquet")}")
    assert(m("lineitem.parquet") == Set("l_orderkey", "l_suppkey", "l_extendedprice"),
      s"lineitem scan (16 cols) not pruned: ${m("lineitem.parquet")}")
  }

  test("document queries prune the documents scan and push the id filter") {
    // q17 only needs (doc_id, text); the scan must not read the rest
    val p = staticPlan(SparkEntry.queries("q17_text_stats")(spark, dir))
    val docScans = scans(p)
    assert(docScans.nonEmpty)
    docScans.foreach { s =>
      assert(s.requiredSchema.names.toSet.subsetOf(Set("doc_id", "text")),
        s"documents scan reads extra columns: ${s.requiredSchema.names.toSeq}")
    }
    // and a predicate on the scanned table reaches the parquet reader
    val fp = staticPlan(model.Tables.table(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10))
    val pushed = scans(fp).head.metadata("PushedFilters")
    assert(pushed.contains("LessThan(doc_id,10)"), s"not pushed: $pushed")
  }

  test("permutation join broadcasts the position table (no sort-merge)") {
    val p = staticPlan(SparkEntry.queries("q52_permute_degree")(spark, dir))
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, "expected broadcast hash join for the position lookup")
  }

  test("two-hop path query is cartesian-free and codegen-covered") {
    val p = staticPlan(SparkEntry.queries("q08_two_hop_pairs")(spark, dir))
    val cart = p.collect { case c: CartesianProductExec => c }
    assert(cart.isEmpty, "two-hop must be an equi-join, not a cartesian")
    val wsc = p.collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, "expected whole-stage codegen spans")
  }

  test("semDedup reads only (vec_id, embedding) and joins equi on cell") {
    // the literal-centroid assignment must be a pure projection over the
    // pruned scan (no lookup join), and the within-cell comparison an
    // equi-join on the cell key — never a cross product
    val p = staticPlan(SparkEntry.queries("q69_semdedup")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      "within-cell pruning must join on cell, not cross")
    // the centroid assignment is persisted, so the parquet scan lives
    // inside the InMemoryRelation's cached plan — audit through it
    val cached = p.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan
    }
    val es = (p +: cached).flatMap(scans)
    assert(es.nonEmpty)
    es.foreach { s =>
      assert(s.requiredSchema.names.toSet.subsetOf(Set("vec_id", "embedding")),
        s"embeddings scan reads extra columns: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("12-feature aggregation plans a bounded number of shuffles") {
    // one grouped aggregation + one sort-window median pass + the
    // base⋈median join and the edge-derivation join; at sf sizes the join
    // sides can broadcast, so pin an upper bound on exchanges rather than
    // an exact count
    val p = staticPlan(SparkEntry.queries("q04_features")(spark, dir))
    val n = shuffles(p).size
    assert(n <= 4, s"feature aggregation shuffle count regressed: $n")
  }

  test("approx feature mode: one shuffle, no Expand, no sort-window pass") {
    // the documented trade-off of the approx OPERATOR (the q62 face joins
    // it against the exact operator to compute its bounded-error flags,
    // so the face's plan legitimately contains the exact side's window
    // pass — the fixed-state shape is pinned on the operator itself):
    // HLL++/KLL sketch state instead of the exact path's sort-window
    // median and distinct Expand — the plan must show exactly the
    // fixed-state single-aggregation shape
    val p = staticPlan(ops.Features.accountFeaturesApprox(
      ops.Windows.withWindowId(model.Tables.edges(spark, dir), 14, 7)))
    val expands = p.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.isEmpty, "approx mode must not plan a distinct Expand")
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "approx mode must not plan a median window pass")
    // union of the two edge sides → ONE aggregation exchange (plus the
    // edge-derivation join's own exchanges at most)
    assert(shuffles(p).size <= 3,
      s"approx aggregation shuffle count regressed: ${shuffles(p).size}")
  }

  test("pair-nonzero counts: map-side pair explosion, exactly one shuffle") {
    // q55's round-9 rewrite (Features.pairNonzeroCounts): ordered feature
    // pairs are generated per row by array HOFs, so the only exchange in
    // the operator is the final (wid, f1, f2) aggregation — the previous
    // melted self-join paid two corpus-scale shuffles (round-8 verdict #3)
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val feats = (0L until 8L).map(i => (i % 3, i))
      .toDF("wid", "account")
    val wide = ops.Features.featureCols.zipWithIndex.foldLeft(feats) {
      case (df, (c, i)) => df.withColumn(c, lit(i % 2))
    }
    val p = staticPlan(ops.Features.pairNonzeroCounts(wide))
    assert(shuffles(p).size == 1,
      s"pair-nonzero must shuffle once (the final groupBy): ${shuffles(p)}")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("contamination query prunes both document scans to (doc_id, text)") {
    val p = staticPlan(SparkEntry.queries("q64_contamination")(spark, dir))
    val docScans = scans(p)
    assert(docScans.nonEmpty)
    docScans.foreach { s =>
      assert(s.requiredSchema.names.toSet.subsetOf(Set("doc_id", "text")),
        s"documents scan reads extra columns: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("windowed feature query keeps the median window codegen-eligible") {
    val p = staticPlan(SparkEntry.queries("q05_features_by_window")(spark, dir))
    // no ObjectHashAggregate (the non-codegen `percentile` shape this
    // design explicitly avoids)
    val objAgg = p.collect {
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }
    assert(objAgg.isEmpty,
      "median must stay a sort-window pass, not an ObjectAggregate percentile")
  }

  test("as-of join: no range explosion, key-partitioned shuffles only") {
    val p = staticPlan(SparkEntry.queries("q79_asof_prev_order")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      "as-of must never plan a cartesian/range join")
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "as-of is a union+window, not a join operator")
    // every shuffle is hash-partitioned on the customer key (the tie
    // collapse agg and the running-state window share it)
    val parts = shuffles(p).map(_.outputPartitioning.toString)
    assert(parts.nonEmpty && parts.forall(_.contains("o_custkey")),
      s"unexpected shuffle partitioning: $parts")
  }

  test("interval join: equi on the time bin, never a nested-loop range join") {
    // q81 — the whole point of the bucketed form: Spark plans a raw
    // `p.ts BETWEEN i.s AND i.e` join as BroadcastNestedLoopJoin (or a
    // cartesian); the bin equi key must keep it a hash/sort-merge join
    // with the range predicate as a residual
    val p = staticPlan(
      SparkEntry.queries("q81_interval_concurrency")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      "interval join must never plan a cartesian")
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "interval join must never plan a nested loop")
    val equi = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
      case j: BroadcastHashJoinExec => j.leftKeys
    }
    assert(equi.nonEmpty && equi.exists(_.exists(_.toString.contains("__b"))),
      s"expected an equi join keyed on the time bin, got $equi")
  }

  test("ngram novelty: gram shuffle rides the 60-bit key, scans pruned") {
    val p = staticPlan(SparkEntry.queries("q83_ngram_novelty")(spark, dir))
    scans(p).foreach(s =>
      assert(s.requiredSchema.names.toSet.subsetOf(Set("doc_id", "text")),
        s"documents scan reads extra columns: ${s.requiredSchema.names.toSeq}"))
    // the one wide exchange must be keyed on the md5-derived BIGINT,
    // never on the gram string (8-byte shuffle rows vs ~30-byte grams)
    val parts = shuffles(p).map(_.outputPartitioning.toString)
    assert(parts.exists(_.contains("gk#")),
      s"expected a gk-keyed exchange: $parts")
    assert(!parts.exists(_.contains("(g#")),
      s"gram-string exchange leaked into the plan: $parts")
  }

  test("weighted sample: key projection is shuffle-free, one group window") {
    val p = staticPlan(SparkEntry.queries("q80_weighted_sample")(spark, dir))
    val sh = shuffles(p)
    assert(sh.size == 1, s"expected exactly the group-window shuffle: $sh")
    assert(sh.head.outputPartitioning.toString.contains("source"))
    scans(p).foreach(s =>
      assert(s.requiredSchema.names.toSet ==
        Set("source", "doc_id", "n_chars")))
  }

  test("overlap join (q89) and simhash pairing (q90) stay cartesian-free") {
    // both are bucketed/banded equi joins by construction — a raw range
    // or pairwise predicate would plan a nested-loop cartesian
    for (q <- Seq("q89_session_overlap", "q90_simhash_pairs")) {
      val p = staticPlan(SparkEntry.queries(q)(spark, dir))
      val cart = p.collect { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"$q planned a cartesian: $p")
      val bnl = p.collect {
        case b: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => b
      }
      assert(bnl.isEmpty, s"$q planned a nested-loop join: $p")
    }
  }

  test("mixture epoch: weights broadcast, corpus side map-only") {
    import org.apache.spark.sql.functions.col
    val docs = model.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").as("n_tokens"))
    val p = staticPlan(graft.ops.Sampling.mixtureEpoch(docs))
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == 1, s"expected one broadcast weights join: $p")
    // the streamed (corpus) side must reach its parquet scan without any
    // exchange — the epoch manifest is a map-only pass over the corpus
    val streamed = bhj.head.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.head.left
      case _ => bhj.head.right
    }
    assert(shuffles(streamed).isEmpty,
      s"corpus side shuffles before the weights join: $streamed")
    assert(scans(streamed).nonEmpty, "corpus side lost its parquet scan")
  }

  test("hll sketch (q93): register-table shuffles only, lineitem pruned") {
    val p = staticPlan(SparkEntry.queries("q93_hll_distinct")(spark, dir))
    // the sketch must never shuffle raw keys: every exchange partitions
    // the ≤m-row-per-group register/aggregate tables, and the only wide
    // row set (the scan) reaches its first partial agg map-side. Pin the
    // count: register agg + per-group rollup + exact-verify distinct +
    // the final join's two sides = a small constant, not O(plan growth).
    assert(shuffles(p).size <= 5, s"q93 shuffle count grew: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet ==
        Set("l_orderkey", "l_returnflag"),
        s"lineitem scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("kmv sketch (q95): pruned scans, the only nested-loop is the " +
      "|groups|² threshold cross") {
    val p = staticPlan(SparkEntry.queries("q95_kmv_intersect")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q95 planned a cartesian: $p")
    // the pairs table crosses per-group thresholds under g_a < g_b — a
    // deliberate tiny (|groups|²) broadcast nested loop; nothing else
    // may plan one (the sample and exact joins are equi)
    val bnl = p.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.size <= 1, s"q95 grew nested-loop joins: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet ==
        Set("l_orderkey", "l_returnflag"),
        s"lineitem scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("bpe encode faces (q92/q97) are MAP-ONLY: zero shuffles") {
    // the learned merges are plan literals, so corpus encoding — counts
    // or the positional token stream — must reach the sink without any
    // exchange (the 100 TB tokenize-scan-to-sink shape)
    for (q <- Seq("q92_bpe_encode", "q97_bpe_tokens")) {
      val p = staticPlan(SparkEntry.queries(q)(spark, dir))
      assert(shuffles(p).isEmpty, s"$q shuffles: $p")
      scans(p).foreach { s =>
        assert(s.requiredSchema.names.toSet == Set("doc_id", "text"),
          s"$q documents scan not pruned: ${s.requiredSchema.names.toSeq}")
      }
    }
  }

  test("cms sketch (q94): grid probes are broadcast joins, no cartesian") {
    val p = staticPlan(
      SparkEntry.queries("q94_cms_heavy_hitters")(spark, dir))
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == ext.Sketches.CmDepth,
      s"expected ${ext.Sketches.CmDepth} broadcast grid probes: $p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q94 planned a cartesian: $p")
  }

  test("bucketed join (q99): ZERO exchanges — bucket-aligned sort-merge " +
      "join and co-partitioned rollup") {
    val p = staticPlan(SparkEntry.queries("q99_bucketed_join")(spark, dir))
    // the write paid the partitioning once; the read side must never
    // shuffle — not for the join, not for the per-order aggregate
    assert(shuffles(p).isEmpty, s"q99 shuffles: $p")
    val smj = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smj.size == 1, s"q99 lost the sort-merge join: $p")
    // both scans actually run bucketed (co-location is real, not a
    // coincidence of tiny data)
    val bucketed = scans(p).flatMap(_.relation.bucketSpec)
    assert(bucketed.size == 2 && bucketed.forall(_.numBuckets == 8),
      s"q99 scans not bucketed: $p")
  }

  test("doc chunking (q102) is MAP-ONLY: zero shuffles, pruned scan") {
    // one split per row, sequence + posexplode + shared-array slices —
    // the chunk-scan-to-sink shape must never exchange
    val p = staticPlan(SparkEntry.queries("q102_doc_chunks")(spark, dir))
    assert(shuffles(p).isEmpty, s"q102 shuffles: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet == Set("doc_id", "text"),
        s"q102 scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("corpus cube (q103): ONE scan through Expand, one aggregation") {
    // four grouping sets from a single pass — the plan must hold exactly
    // one Expand over one scan, not a union of four scans
    val p = staticPlan(SparkEntry.queries("q103_corpus_cube")(spark, dir))
    val expands = p.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }
    assert(expands.size == 1, s"q103 lost the Expand: $p")
    assert(scans(p).size == 1, s"q103 scanned more than once: $p")
    assert(shuffles(p).size <= 1, s"q103 shuffle count grew: $p")
  }

  test("triangle counts (q109): equi wedge joins only, no cartesian") {
    val p = staticPlan(
      SparkEntry.queries("q109_triangle_counts")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q109 planned a cartesian: $p")
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"q109 planned a nested-loop join: $p")
  }

  test("dpp (q110): the dim filter reaches the fact scan as a " +
      "dynamic-pruning subquery and prunes partitions at RUNTIME") {
    // static shape: the partitioned fact scan must carry a
    // DynamicPruningExpression partition filter — the optimizer cannot
    // statically invert quarter(m) = 2 into a predicate on the join key,
    // so if DPP didn't fire the scan would read all 83 month partitions
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q110_dpp_prune")(spark, dir)
      val p = df.queryExecution.executedPlan
      val factScan = scans(p)
        .filter(_.relation.partitionSchema.nonEmpty)
      assert(factScan.size == 1, s"expected one partitioned scan: $p")
      assert(factScan.head.partitionFilters.exists(
        _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst
          .expressions.DynamicPruningExpression])),
        s"no dynamicpruning subquery on the fact scan: " +
          s"${factScan.head.partitionFilters}")
      // runtime proof: execute and read the scan's partitions-read
      // metric — Q2 has 3 months/year over 1995..2001 = 21 of the 83
      // written partitions
      df.collect()
      val partsRead = factScan.head.metrics("numPartitions").value
      assert(partsRead == 21,
        s"DPP read $partsRead partitions, wanted 21 of 83")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("cdc extract (q142): ONE full-outer key join, never a nested " +
      "loop — unchanged keys die in the post-join filter") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, SortMergeJoinExec}
    val p = staticPlan(SparkEntry.queries("q142_cdc_extract")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q142 planned a cartesian: $p")
    assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"q142 planned a nested loop: $p")
    val fo = p.collect {
      case j: SortMergeJoinExec if j.joinType.toString == "FullOuter" => j }
    assert(fo.size == 1, s"wanted exactly one full-outer join: $p")
  }

  test("deletion vectors (q143): the MoR read applies tombstones as " +
      "ONE broadcast anti join") {
    val p = staticPlan(
      SparkEntry.queries("q143_deletion_vectors")(spark, dir))
    val anti = p.collect {
      case j: BroadcastHashJoinExec
        if j.joinType.toString == "LeftAnti" => j }
    assert(anti.size == 1, s"wanted one broadcast anti join: $p")
  }

  test("incremental join view (q145): dim sides broadcast, refresh is " +
      "key-equi — no cartesian, no shuffled dim") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val p = staticPlan(
      SparkEntry.queries("q145_incremental_join")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q145 planned a cartesian: $p")
    assert(p.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"q145 planned a nested loop: $p")
    val bhj = p.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"customer dim not broadcast on both sides: $p")
  }

  test("hierarchical layout (q141): static y/d pruning composes with " +
      "dynamic m pruning — partitions read == matching (y,m,d) leaves") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q141_hier_prune")(spark, dir)
      val p = df.queryExecution.executedPlan
      val factScan = scans(p).filter(_.relation.partitionSchema.nonEmpty)
      assert(factScan.size == 1, s"expected one partitioned scan: $p")
      assert(factScan.head.partitionFilters.exists(
        _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst
          .expressions.DynamicPruningExpression])),
        s"no dynamic pruning on the m level: " +
          s"${factScan.head.partitionFilters}")
      df.collect()
      // the exact leaf counts, from the same data the fact was cut from
      val ymd = model.Tables.table(spark, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .select(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"))
        .distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      val total = ymd.length
      val expected = ymd.count { case (y, m, d) =>
        y == 1996 && Seq(4, 5, 6).contains(m) && d <= 7 }
      val partsRead = factScan.head.metrics("numPartitions").value
      assert(expected > 0 && expected < total,
        s"degenerate fixture: $expected of $total")
      assert(partsRead == expected,
        s"multi-level pruning read $partsRead of $total leaf " +
          s"partitions, wanted $expected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("scd2 (q115) keeps its window partitioned; snapshot diff (q116) " +
      "is an equi full-outer join, never a cartesian") {
    val p5 = staticPlan(
      SparkEntry.queries("q115_scd2_intervals")(spark, dir))
    val wins = p5.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"q115 lead window lost its key partitioning: $p5")
    val p6 = staticPlan(
      SparkEntry.queries("q116_snapshot_diff")(spark, dir))
    assert(p6.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q116 planned a cartesian: $p6")
    assert(p6.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"q116 planned a nested-loop join: $p6")
  }

  test("table stats (q106): six distinct-counts in ONE scan through " +
      "one Expand") {
    val p = staticPlan(SparkEntry.queries("q106_table_stats")(spark, dir))
    assert(scans(p).size == 1, s"q106 scanned more than once: $p")
    val expands = p.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }
    assert(expands.size == 1,
      s"q106 expected one Expand for the multi-distinct agg: $p")
  }

  test("gapfill (q107) and moving average (q108): no cartesian, " +
      "windows stay partitioned") {
    val p7 = staticPlan(SparkEntry.queries("q107_hourly_gapfill")(spark, dir))
    assert(p7.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q107 planned a cartesian: $p7")
    val p8 = staticPlan(SparkEntry.queries("q108_moving_avg")(spark, dir))
    val wins = p8.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty &&
      wins.forall(_.partitionSpec.nonEmpty),
      s"q108 window lost its partitioning: $p8")
  }

  test("zorder key (q100) is MAP-ONLY whole-stage codegen") {
    val p = staticPlan(SparkEntry.queries("q100_zorder_key")(spark, dir))
    assert(shuffles(p).isEmpty, s"q100 shuffles: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet ==
        Set("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        s"q100 scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
    // the bit ladder must stay inside codegen (no UDF, no expr walls)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"q100 fell out of whole-stage codegen: $p")
  }

  test("stratified sample (q101): partial window-group-limit runs " +
      "BELOW the shuffle") {
    // the rank-≤-n filter must prune map-side (each task forwards ≤50
    // rows per stratum) — a hot stratum never ships its whole
    // membership to one reducer
    val p = staticPlan(
      SparkEntry.queries("q101_stratified_sample")(spark, dir))
    val limits = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        => w }
    assert(limits.size == 2, s"q101 lost the window group limit: $p")
    val partialBelowShuffle = shuffles(p).exists(ex => ex.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        => w }.nonEmpty)
    assert(partialBelowShuffle,
      s"q101 partial group limit not below the exchange: $p")
  }

  test("dcm quantiles (q98): d broadcast grid probes, pruned scan, the " +
      "only unpartitioned window is the domain-bounded rank table") {
    val p = staticPlan(SparkEntry.queries("q98_dcm_quantiles")(spark, dir))
    // grid lookups: d broadcast equi-joins against the pinned ≤4352-cell
    // grid, plus the rank join — never a cartesian over candidates
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= ext.Sketches.CmDepth,
      s"expected ≥${ext.Sketches.CmDepth} broadcast probes: $p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q98 planned a cartesian: $p")
    // documents scan reads text only (the token-count projection)
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet == Set("text"),
        s"q98 documents scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
    // the single-partition cumulative window runs over the ≤2^16-row
    // distinct-value table (domain-bounded by the clamp), never the
    // corpus: its child must aggregate before sorting
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.size <= 1, s"q98 grew windows: $p")
  }

  test("star join (q131): both dims broadcast, fact join shuffled, " +
      "never a cartesian") {
    val p = staticPlan(SparkEntry.queries("q131_star_join")(spark, dir))
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }
    // the two explicit dim broadcasts must hold; at sf0.001 Spark may
    // legitimately broadcast the orders side of the fact join too, so
    // pin ≥ 2 — what matters is no dim ever reaches a shuffle
    assert(bhj.size >= 2, s"expected ≥2 broadcast dims: $p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
    // dim scans pruned to the join key + the grouped column
    val byTable = scans(p).map(s =>
      s.relation.location.rootPaths.head.getName ->
        s.requiredSchema.names.toSet).toMap
    assert(byTable("customer.parquet") ==
      Set("c_custkey", "c_mktsegment"))
    assert(byTable("part.parquet") == Set("p_partkey", "p_brand"))
  }

  test("pivot (q122) stays Spark's two-stage pivot aggregate over a " +
      "pruned scan — no per-status passes") {
    val p = staticPlan(SparkEntry.queries("q122_order_pivot")(spark, dir))
    // stage 1 shuffles on (month, status); stage 2's pivot-first shuffle
    // moves only the already-aggregated month×status frame (≤ 3 rows per
    // month) — never a third pass, never one scan per status value
    assert(shuffles(p).size <= 2, s"q122 grew shuffles: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet ==
        Set("o_orderdate", "o_orderstatus", "o_totalprice"),
        s"q122 orders scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("funnel (q124): every stage join is an equi-join on user_id, " +
      "never a cartesian or nested loop") {
    val p = staticPlan(SparkEntry.queries("q124_event_funnel")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q124 planned a cartesian: $p")
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"q124 planned a nested-loop join: $p")
  }

  test("rollup (q135): ONE scan through Expand; transition matrix " +
      "(q134) and last-touch (q136) keep their windows key-partitioned") {
    val p5 = staticPlan(
      SparkEntry.queries("q135_rollup_hierarchy")(spark, dir))
    assert(scans(p5).size == 1, s"q135 re-scanned: $p5")
    assert(p5.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.size == 1, s"q135 expected one Expand: $p5")
    Seq("q134_event_transitions", "q136_last_touch").foreach { q =>
      val p = staticPlan(SparkEntry.queries(q)(spark, dir))
      val wins = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$q window lost its key partitioning: $p")
    }
  }

  test("ingest faces stay map-only: WAP quarantine (q137) and " +
      "pseudonymization (q138) plan ZERO shuffles") {
    Seq("q137_wap_quarantine", "q138_pseudonymize").foreach { q =>
      val p = staticPlan(SparkEntry.queries(q)(spark, dir))
      assert(shuffles(p).isEmpty, s"$q grew a shuffle: $p")
    }
  }

  test("histogram (q133) is one aggregation pair; unpivot (q123) melts " +
      "through Expand; neither plans a join") {
    val p3 = staticPlan(
      SparkEntry.queries("q133_value_histogram")(spark, dir))
    assert(shuffles(p3).size == 1, s"q133 grew shuffles: $p3")
    val p2 = staticPlan(
      SparkEntry.queries("q123_source_unpivot")(spark, dir))
    assert(p2.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.size == 1, s"q123 expected one Expand: $p2")
    Seq(p3, p2).foreach { p =>
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
      assert(p.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
        s"unexpected join: $p")
    }
  }

  test("anomalies (q132), cohorts (q125), skew profile (q129): " +
      "equi-joins only, never a cartesian or nested loop") {
    Seq("q132_rate_anomalies", "q125_retention_cohorts",
      "q129_skew_profile").foreach { q =>
      val p = staticPlan(SparkEntry.queries(q)(spark, dir))
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q planned a cartesian: $p")
      assert(p.collect {
        case b: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => b
      }.isEmpty, s"$q planned a nested loop: $p")
    }
  }

  test("ivf append report (q153): cartesian-free — the only non-equi " +
      "joins are the 1-row totals/drift broadcasts; embeddings scans " +
      "pruned") {
    val p = staticPlan(SparkEntry.queries("q153_ivf_append")(spark, dir))
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q153 planned a cartesian: $p")
    // broadcast nested-loop joins are legal ONLY against 1-row sides
    // (the totals and drift scalars); a corpus-sized BNLJ would be the
    // all-pairs catastrophe
    val bnlj = p.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b }
    assert(bnlj.size <= 2, s"q153 grew extra nested-loop joins: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet
        .subsetOf(Set("vec_id", "embedding")),
        s"q153 scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("paragraph splitter (paragraphsOf) is MAP-ONLY: zero shuffles, " +
      "pruned scan") {
    val docs = model.Tables.table(spark, dir, "documents")
    val p = staticPlan(graft.ext.Dedup.paragraphsOf(docs))
    assert(shuffles(p).isEmpty, s"paragraphsOf shuffled: $p")
    scans(p).foreach { s =>
      assert(s.requiredSchema.names.toSet == Set("doc_id", "text"),
        s"paragraphsOf scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
  }

  test("bloom semijoin (q126): the word-table probes are broadcast " +
      "joins; the fact scan is pruned") {
    val p = staticPlan(
      SparkEntry.queries("q126_bloom_semijoin")(spark, dir))
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3, s"expected k broadcast word probes: $p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
    val liScans = scans(p).filter(
      _.relation.location.rootPaths.head.getName == "lineitem.parquet")
    liScans.foreach { s =>
      assert(s.requiredSchema.names.toSet.subsetOf(Set("l_orderkey",
        "l_shipdate", "l_quantity", "l_extendedprice")),
        s"q126 lineitem scan not pruned: ${s.requiredSchema.names.toSeq}")
    }
  }
}
