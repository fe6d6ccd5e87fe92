package graft.ops

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-quality gates: the properties that make these queries survive a
  * 100× scale-up are asserted, not just eyeballed — filter pushdown, column
  * pruning, broadcast selection, top-k physical operator, shuffle counts. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    // AQE wraps subtrees; collect through the adaptive boundary
    val expanded = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    (p +: expanded).flatMap(_.collect(pf))
  }

  test("filters are pushed into the parquet scan") {
    val scans = collectAll(plan("p2_filter_project")) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThan(l_quantity") && pushed.contains("l_returnflag"),
      s"pushed=$pushed")
  }

  test("projection prunes the scan schema to the selected columns") {
    val scans = collectAll(plan("s1_scan_distinct")) { case s: FileSourceScanExec => s }
    assert(scans.head.requiredSchema.fieldNames.toSeq == Seq("o_custkey"))
  }

  test("star join broadcasts every dimension") {
    val bhj = collectAll(plan("j5_star_join")) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 4, s"expected 4 broadcast joins, got ${bhj.size}")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    Seq("o1_topk", "x_sample_fixed_k").foreach { name =>
      val tops = collectAll(plan(name)) { case t: TakeOrderedAndProjectExec => t }
      assert(tops.nonEmpty, s"$name should plan TakeOrderedAndProject")
    }
  }

  test("grouped aggregation shuffles exactly once") {
    val shuffles = collectAll(plan("a3_grouped_counts")) { case e: ShuffleExchangeExec => e }
    // one exchange for the groupBy, one for the final orderBy — nothing more
    assert(shuffles.size <= 2, s"got ${shuffles.size} shuffles")
  }

  test("interval join plans as an equi join, never a nested loop") {
    // the range predicate must ride as a residual condition on the user_id
    // equi join — a BroadcastNestedLoop/Cartesian plan would be O(n²) at scale
    val p = plan("j9_interval_join")
    val bad = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty, s"nested-loop join in interval-join plan: $bad")
    val equi = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: BroadcastHashJoinExec => j
    }
    assert(equi.nonEmpty, "expected an equi join on user_id")
  }

  test("posexplode generator stays in the scan stage (no extra shuffle)") {
    val shuffles = collectAll(plan("e1_posexplode")) { case e: ShuffleExchangeExec => e }
    // only the final orderBy may exchange; the Generate itself is pipelined
    assert(shuffles.size <= 1, s"got ${shuffles.size} shuffles")
  }

  test("exists subquery decorrelates to a semi join (no subquery at runtime)") {
    val p = plan("r3_exists_subquery")
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.joinType.toString
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.joinType.toString
      case j: BroadcastHashJoinExec => j.joinType.toString
    }
    assert(joins.exists(_.toLowerCase.contains("semi")), s"join types: $joins")
  }

  test("global windows are de-globalized: no SinglePartition window exchange") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.window.WindowExec
    // all global-order queries decompose over deterministic value buckets:
    // every window operator is bucket-partitioned, never SinglePartition
    // (x_dedup_keep_best's argmax window is partitioned by cluster key)
    Seq("w5_distribution", "w7_range_frame", "x_pack_greedy_bins",
        "x_dedup_keep_best", "x_pipeline_curriculum",
        "w10_rolling_median", "w11_ewma").foreach { name =>
      val wins = collectAll(plan(name)) { case w: WindowExec => w }
      assert(wins.nonEmpty, s"$name expected a bucket-partitioned window")
      wins.foreach(w => assert(w.child.outputPartitioning != SinglePartition,
        s"$name plans a SinglePartition window exchange"))
    }
  }

  test("batch-4 plans: broadcast side-tables, no nested-loop pair joins") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // Target encoding: category and global stats join back as broadcasts
    // (they are |categories|- and 1-row-sized at any corpus size) — the row
    // table must never shuffle for them.
    val te = plan("x_feat_target_encode")
    assert(collectAll(te) { case b: BroadcastHashJoinExec => b }.size >= 1,
      "target-encode category join should broadcast")
    // Perceptual-hash banding: the PAIR JOIN (phashNearDupPairs, the op the
    // x_mm_phash band keys feed) must key by (band, bucket) — an equi hash
    // join, never a nested-loop/cartesian pair scan. (a15's 1-row
    // grand-total crossJoin IS a broadcast nested loop — that one is
    // constant-sized by construction, so only the pair joins are gated.)
    val hashed = graft.Tables(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .select(org.apache.spark.sql.functions.col("doc_id").as("media_id"),
        graft.ext.Multimodal.phash60("text").as("phash"))
    val pairPlans = Seq(
      "phashNearDupPairs" ->
        graft.ext.Multimodal.phashNearDupPairs(hashed).queryExecution.executedPlan,
      "w9_transition_counts" -> plan("w9_transition_counts"))
    pairPlans.foreach { case (name, p) =>
      assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
        collectAll(p) { case j: CartesianProductExec => j }.isEmpty,
        s"$name plans a nested-loop or cartesian join")
    }
  }

  test("bloom-sketch membership never shuffles raw document text") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // The exact-membership leg keys on sha2(text,256): no Exchange in the
    // plan may hash-partition on a raw `text` attribute — a text-keyed
    // shuffle moves whole document bodies and dominates the query at scale.
    val shuffles = collectAll(plan("x_sketch_bloom")) { case e: ShuffleExchangeExec => e }
    shuffles.foreach { e =>
      e.outputPartitioning match {
        case h: HashPartitioning =>
          val keyed = h.expressions.flatMap(_.references.toSeq).map(_.name)
          assert(!keyed.contains("text"),
            s"exchange hash-partitions on raw text: ${h.expressions}")
        case _ => ()
      }
    }
  }

  test("runtime bloom filter is injected into the fact scan of a star join") {
    // The 100 TB star-join shape: a selective dim filter should cut fact
    // I/O BEFORE the join via an injected bloom filter (runtime filtering).
    // Local thresholds are tuned for TB-scale scans, so the gate pins the
    // MECHANISM with test-scoped thresholds; on a cluster the defaults fire.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val fact = graft.Tables(spark, sf, "lineitem")
      val dim = graft.Tables(spark, sf, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("bloom_filter") || planStr.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${planStr.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("novelty shuffles the gram stream exactly once (no join-back)") {
    // The r4 plan joined the exploded gram stream back to its own
    // doc-frequency table — a second full-stream Exchange. The rewrite takes
    // novel counts from the dfreq=1 owner inside the gram-grouped aggregate,
    // so the FULL gram stream crosses exactly one Exchange; everything after
    // it is dfreq=1 residue (owner re-group) plus the final orderBy. Total
    // budget: 3 (gram agg, owner agg, sort) — a 4th means the join-back is
    // back (VERDICT r4 next-round #1).
    val shuffles = collectAll(plan("x_text_novelty")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 3, s"got ${shuffles.size} shuffles:\n" +
      shuffles.map(_.outputPartitioning).mkString("\n"))
  }

  test("span consumers scan the persisted index, not a gram re-aggregation") {
    // VERDICT r4 #2: the duplicated-span inventory is a build-once
    // SnapshotTable artifact (CorpusOps.spanIndexBuild); probe-time span
    // queries and the composed curation pipeline must READ it — a
    // count(distinct doc_id)-over-grams aggregation in their plans means the
    // index is being re-derived per query.
    Seq("x_dedup_span_removal", "x_pipeline_curation").foreach { name =>
      val planStr = plan(name).toString
      assert(planStr.contains("graft-spans"),
        s"$name does not scan the span index artifact")
    }
    val removal = plan("x_dedup_span_removal").toString
    assert(!removal.toLowerCase.contains("count(distinct"),
      "span removal re-derives the gram doc-frequency aggregation")
  }

  test("gram-based corpus queries never shuffle document text or gram strings") {
    // The scale contract of the span/novelty/overlap family: n-grams are
    // hashed to 60-bit longs in the projection that creates them, so every
    // exchange carries constant-width keys — a text or gram-string column
    // in any shuffle output means the contract regressed.
    Seq("x_dedup_substring_spans", "x_text_novelty", "x_corpus_source_overlap")
      .foreach { name =>
        val shuffled = collectAll(plan(name)) { case e: ShuffleExchangeExec =>
          e.output.map(_.name).filter(n => n == "text" || n == "gs" || n == "toks")
        }.flatten
        assert(shuffled.isEmpty, s"$name shuffles ${shuffled.distinct}")
      }
  }

  test("pagerank iterations never re-shuffle the edge list") {
    // VERDICT r5 next-round #4: the adjacency artifact is a CACHED
    // hash(src, n) relation (InMemoryRelation keeps its partitioning where
    // an AQE-era checkpoint reports Unknown), so the per-iteration
    // rank⋈edges join co-partitions and the loop's only full-stream
    // exchange is each round's contribution aggregation. Broadcast is
    // disabled for the audit: at fixture scale AQE would broadcast the
    // edge cache and hide the partitioning property this gate pins (at
    // 100 TB the stats force exactly this SMJ path).
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("x_graph_pagerank")
      val edgeShuffles = collectAll(p) { case e: ShuffleExchangeExec =>
        e.output.map(_.name).filter(n => n == "dst" || n == "outdeg")
      }.flatten
      assert(edgeShuffles.isEmpty, s"edge columns cross an Exchange: $edgeShuffles")
      val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
      // 3 contribution aggregations + the final orderBy — nothing else
      assert(shuffles.size <= 4, s"got ${shuffles.size} shuffles")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("V2 source prunes columns and pages") {
    val df = spark.read.format("ticket-pages")
      .option("pages", "10").option("pageSize", "100").load()
      .select("_id").limit(150)
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.output.map(_.name) == Seq("_id"), s"got ${scan.output}")
    assert(scan.inputRDD.getNumPartitions == 2) // limit 150 -> 2 pages planned
  }

  test("round-6 tier plans: broadcast sketches/models, no pair nested loops") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // Count-Min probe: the ≤1024-cell sketch must broadcast — shuffling the
    // probe side against it would defeat the sketch's whole point.
    assert(collectAll(plan("x_sketch_countmin")) {
      case j: BroadcastHashJoinExec => j }.nonEmpty,
      "countmin probe should broadcast the cell table")
    // DSIR: the K=64-bucket model joins the token stream as a broadcast —
    // the scorer must stay scan-stage however large the corpus.
    assert(collectAll(plan("x_pipeline_dsir")) {
      case j: BroadcastHashJoinExec => j }.nonEmpty,
      "dsir should broadcast the bucket log-ratio model")
    // All-pairs + linear probe + sketches: candidate generation is always
    // keyed (postings, buckets) — a nested-loop/cartesian pair join would
    // be the O(n²) failure mode at scale.
    Seq("x_dedup_tfidf_allpairs", "x_pipeline_dsir", "x_feat_linear_probe",
        "x_sketch_countmin", "x_sketch_hll_md5", "x_sketch_quantile_hist")
      .foreach { name =>
        val bad = collectAll(plan(name)) {
          case j: BroadcastNestedLoopJoinExec
            // 1-row bound/total tables legitimately cross-join in as
            // broadcasts (quantile bounds, HLL truth row); anything bigger
            // nested-looping is a real pair-join failure
            if j.right.outputPartitioning.numPartitions > 1 => j
          case c: CartesianProductExec => c
        }
        assert(bad.isEmpty, s"$name plans a non-broadcast pair join: $bad")
      }
  }

  test("round-7 tier plans: per-query windows, keyed candidates, broadcast LUTs") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // Batch ANN probe: every rank (probed lists, shortlist, final top-k) is
    // a q_id-partitioned window — a SinglePartition rank would serialize
    // the whole batch through one task.
    val batchWins = collectAll(plan("x_sim_ivfadc_batch")) { case w: WindowExec => w }
    assert(batchWins.nonEmpty, "batch probe should rank via windows")
    batchWins.foreach(w => assert(w.child.outputPartitioning != SinglePartition,
      "x_sim_ivfadc_batch plans a SinglePartition window"))
    // L2AP all-pairs and the streamed-ingest twin: candidates are always
    // keyed (postings / band buckets) — nested-loop or cartesian pair
    // generation is the quadratic failure mode.
    Seq("x_dedup_tfidf_allpairs", "st_ingest_neardup").foreach { name =>
      val bad = collectAll(plan(name)) {
        case j: BroadcastNestedLoopJoinExec
          if j.right.outputPartitioning.numPartitions > 1 => j
        case c: CartesianProductExec => c
      }
      assert(bad.isEmpty, s"$name plans a non-broadcast pair join: $bad")
    }
  }

  test("salted join really joins on (key, salt) — the hot key spreads (r8)") {
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // The skew rehearsal (ScaleRehearsal skew) measures the three physical
    // answers to a 30%-hot key; this pins the manual one: the salted plan's
    // join keys must include __salt, or the hot key silently re-collapses
    // onto one task. Forced shuffle hash join so the shape under audit is
    // the shuffled one the salt exists for (broadcast would hide the key).
    import org.apache.spark.sql.functions.{count, lit}
    val events = graft.Tables(spark, sf, "events")
    val users = events.groupBy("user_id").agg(count(lit(1)).as("user_events"))
    val salted = SkewAndBuckets.saltedJoin(
      events, users.hint("shuffle_hash"), "user_id", n = 8)
    val joins = collectAll(salted.queryExecution.executedPlan) {
      case j: SortMergeJoinExec => j.leftKeys
      case j: ShuffledHashJoinExec => j.leftKeys
    }
    assert(joins.nonEmpty, "expected a shuffled join in the salted plan")
    assert(joins.exists(_.exists(_.references.toSeq.exists(_.name == "__salt"))),
      "salted join lost its __salt key — the hot key would land on one task")
  }

  test("shuffle batch-ANN path broadcasts nothing batch-scaled (r8)") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // Plan with optimizer broadcasts disabled so only HINTED broadcasts
    // survive — the at-scale plan, where no relation is "small enough".
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (shuffleP, broadcastP) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (plan("x_sim_ivfadc_batch_shuffle"), plan("x_sim_ivfadc_batch"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // The ONLY broadcast left in the shuffle path is the nLists-row coarse
    // centroid table (static artifact metadata, not batch-scaled); the LUT,
    // probe set, qn and rerank q all flow as shuffle joins.
    val shuffleBc = collectAll(shuffleP) { case b: BroadcastExchangeExec => b }
    assert(shuffleBc.size == 1,
      s"shuffle path should broadcast ONLY the centroid table, found: $shuffleBc")
    // The codes ↔ probe-set join is pinned to a sort-merge on list_id.
    val smj = collectAll(shuffleP) {
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.references.toSeq.exists(_.name == "list_id")) => j
    }
    assert(smj.nonEmpty, "shuffle path should sort-merge-join codes on list_id")
    // Contrast: the broadcast path really does pin batch-scaled broadcasts
    // (probe set, LUT, listTerms, qn, rerank q) — the thing that becomes a
    // memory wall at production batches and why the shuffle path exists.
    val bcBc = collectAll(broadcastP) { case b: BroadcastExchangeExec => b }
    assert(bcBc.size >= 4,
      s"broadcast path should pin multiple broadcasts, found ${bcBc.size}")
  }
}
