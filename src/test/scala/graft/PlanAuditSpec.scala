package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants for the plans that carry the 100 TB posture:
  * broadcasts where a dimension must broadcast, top-k as
  * TakeOrderedAndProject (never a global sort), partial aggregation, and
  * column pruning reaching the parquet scan. A regression here (e.g. a
  * broadcast silently degrading to sort-merge after a refactor) changes no
  * query RESULT, so only a plan audit catches it before the scale bill
  * does. */
class PlanAuditSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("star join broadcasts every dimension (no sort-merge join)") {
    val p = plan("q6_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("levenshtein block join broadcasts the build side") {
    val p = plan("d6_levenshtein")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("stedi pipeline joins via broadcast - the fact side never shuffles on the key") {
    val p = plan("stedi_pipeline")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("forest kernel: survivors reach the union-find without a second exchange") {
    // mpForestEdges' whole point is that the scored pair mass crosses
    // ONE exchange (the probe join's own) and the union-find rides the
    // join output partitions — an Exchange creeping in between the join
    // and the MapPartitions would silently restore the survivor-mass
    // shuffle the kernel exists to remove (the 27-minute zipf-500k
    // wall). The audit walks the formatted tree from the MapPartitions
    // node down to its feeding join and asserts no Exchange between.
    val p = graft.ext.SimilarityQueries
      .mpForestEdges(spark, dir, 0.45)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    val tree = p.linesIterator.takeWhile(!_.startsWith("(1)")).toSeq
    val mpIdx = tree.indexWhere(_.contains("MapPartitions"))
    assert(mpIdx >= 0, p)
    val joinIdx = tree.indexWhere(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"), mpIdx)
    assert(joinIdx > mpIdx, "join must feed the union-find:\n" + p)
    val between = tree.slice(mpIdx + 1, joinIdx)
    assert(!between.exists(_.contains("Exchange")),
      "survivor mass re-shuffled between join and union-find:\n" + p)
  }

  test("epoch-crossing replay self-joins are hash equi-joins on the bucket key") {
    // the two band self-joins must key on (bid, bkey) — an optimizer
    // regression to a nested-loop/cartesian (e.g. the cosine condition
    // swallowing the equi-keys) would be quadratic in the corpus
    // the registered query materializes its bounded result eagerly
    // (plan = ExistingRDD), so audit the LAZY pre-materialization frame
    // the band projection underneath is the shared width-keyed cache
    // entry (rebuiltBandIndex's frame) — never released by callers
    val out = graft.ext.SimilarityQueries.annEpochReplayLazy(spark, dir)
    val p = out.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("HashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q2_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ann top-k scan broadcasts the query vector and takes a bounded heap") {
    val p = plan("s1_ann_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("aggregation splits partial/final (map-side combine before the shuffle)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("column pruning reaches the lineitem scan in q1") {
    val p = plan("q1_agg")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_returnflag") && !read.contains("l_comment"), read)
  }

  test("filter pushdown reaches the parquet scan in the null filter") {
    val p = plan("r_null_filter")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
  }

  test("partition pruning: a lang-partitioned write is read back via PartitionFilters") {
    val out = java.nio.file.Files.createTempDirectory("part").toString
    SparkEntry.queries("t1_langid")(spark, dir)  // warm fixture (any query)
    Tables.load(spark, dir, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val df = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("lang")), p)
    // The pruned scan must not list non-matching partitions' row count:
    // every row read carries lang = en.
    assert(df.collect().forall(_.getAs[String]("lang") == "en"))
  }

  test("ANN variants recover most of the exact top-10 (recall audit)") {
    def ids(name: String): Set[Long] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.getLong(0)).toSet
    val exact = ids("s1_ann_topk")
    val lsh = ids("s4_ann_lsh")
    val ivf = ids("s5_ann_ivf")
    assert(exact.size == 10)
    assert((exact intersect lsh).size >= 5, s"LSH recall: ${(exact intersect lsh).size}/10")
    assert((exact intersect ivf).size >= 5, s"IVF recall: ${(exact intersect ivf).size}/10")
  }

  test("MIPS LSH recovers most of the exact max-dot top-10") {
    graft.functions.GraftFunctions.register(spark)
    val lsh = SparkEntry.queries("s13_mips")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .selectExpr("embedding as qv")
    val exact = e.filter(org.apache.spark.sql.functions.col("vec_id") > 0)
      .crossJoin(org.apache.spark.sql.functions.broadcast(q))
      .selectExpr("vec_id",
        "cast(round((1.0D + cast(vec_id % 7 as double) / 4.0D) * " +
          "dot_product(embedding, qv) * 1000000.0D, 0) as bigint) as dm")
      .orderBy(org.apache.spark.sql.functions.col("dm").desc,
        org.apache.spark.sql.functions.col("vec_id").asc)
      .limit(10).collect().map(_.getLong(0)).toSet
    assert(lsh.size == 10 && exact.size == 10)
    assert((exact intersect lsh).size >= 5,
      s"MIPS recall: ${(exact intersect lsh).size}/10")
  }

  test("whole-stage codegen covers the similarity hot path (no fallback islands)") {
    // AQE's pre-execution formatted plan carries no codegen annotations;
    // execute first, then read the final adaptive plan.
    val df = SparkEntry.queries("s1_ann_topk")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // Codegen stages render as "*(n)" in the final adaptive plan; the
    // cosine expression must sit INSIDE one (a custom expression that
    // fell back to interpreted eval would lose the asterisk).
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("cosinesimilarity")), p)
  }

  test("as-of join and sessionizer are each ONE shuffle plus the harness sort") {
    // The README's temporal claim, enforced: union + single (key, time)
    // window pass — a per-row subquery or time-range cross join would
    // show extra exchanges or a joined second scan.
    Seq("q19_asof_join", "q21_sessionize").foreach { name =>
      val p = plan(name)
      assert("Exchange \\(\\d+\\)".r.findAllIn(p).size == 2,
        s"$name must shuffle exactly twice (window + final sort):\n$p")
    }
  }

  test("pii redaction is a narrow projection: only the harness sort exchanges") {
    val p = plan("t8_pii_redact")
    // One Exchange (rangepartitioning for the final ORDER BY), no
    // hashpartitioning shuffle — the scrub itself never moves data.
    // ("Exchange (n)" matches the tree line only; the formatted detail
    // section repeats every node as "(n) Exchange".)
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size == 1, p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("knn graph top-k plans as WindowGroupLimit, not a full per-key sort") {
    val p = plan("s10_knn_join")
    // rank <= k over the (vec_id) window must rewrite to the bounded
    // per-group heap — without it every vector's whole candidate list is
    // buffered and sorted, which is what blows up on a hot bucket at scale.
    assert(p.contains("WindowGroupLimit"), p)
    // test decontamination probe: the test-shingle dictionary broadcasts.
    val p8 = plan("p8_decontaminate")
    assert(p8.contains("BroadcastHashJoin"), p8)
    assert(!p8.contains("SortMergeJoin"), p8)
  }

  test("lm score count tables broadcast; the bigram stream never shuffles on words") {
    // the registered query rides a (session, dir) checkpoint since r15
    // (plan = ExistingRDD) — audit the lazy build plan
    val p = graft.ext.TextQueries.lmScoreBuild(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("reservoir sample and histogram keep their bounded-memory plans") {
    // p10: per-source top-k must rewrite to the bounded per-group heap.
    assert(plan("p10_reservoir").contains("WindowGroupLimit"))
    // q47: the (min, max) stats row broadcasts; no sort-merge anywhere.
    val h = plan("q47_histogram")
    assert(h.contains("BroadcastNestedLoopJoin") || h.contains("BroadcastExchange"), h)
    assert(!h.contains("SortMergeJoin"), h)
  }

  test("cdc compaction is an aggregate, not a window sort") {
    val p = plan("q50_cdc_compact")
    // max_by must plan as partial+final ObjectHashAggregate/SortAggregate,
    // never a per-key WindowExec sort (the row_number formulation).
    assert(!p.contains("Window"), p)
    assert(p.contains("Aggregate"), p)
  }

  test("linear probe scores without any shuffle before the confusion-grid agg") {
    val p = plan("s12_linear_probe")
    // scoring is a narrow projection; exchanges = repartition(vec_id) +
    // the grid agg + the harness sort, never a join.
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("bpe mining plans map-side partials and a bounded top-k") {
    val p = plan("t12_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("bpe training round: bounded TakeOrdered(1) over map-side pair partials") {
    // the per-round driver crossing must stay ONE row: a partial/final
    // hash aggregate over the pair keys feeding a bounded
    // TakeOrderedAndProject — never a global sort, never a CollectLimit
    // that funnels the vocabulary through one task, and nothing
    // corpus-sized in the plan at all (the vocab collapse IS the only
    // aggregate below the pair count).
    val seg = graft.ext.TextQueries.bpeVocab(spark, dir)
    val p = graft.ext.TextQueries.bpeRoundWinner(seg)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CollectLimit"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("batched bpe round: the wider crossing is still one bounded TakeOrdered") {
    // t33's driver crossing per round is the top-BpeCandWindow ranked
    // pairs — the SAME TakeOrderedAndProject shape as t31's 1-row
    // crossing, just wider, and still nothing corpus-sized: no global
    // sort, no CollectLimit, no join, no window.
    val seg = graft.ext.TextQueries.bpeVocab(spark, dir)
    val p = graft.ext.TextQueries
      .bpeRoundTop(seg, graft.ext.TextQueries.BpeCandWindow)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CollectLimit"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("bpe apply probes the cached trained segmentation by broadcast: no retrain") {
    // t32's plan must read the once-per-(session, dir) checkpointed
    // segmentation (Scan ExistingRDD), broadcast the vocabulary-grain
    // subword counts onto the corpus token stream, and contain NO
    // training machinery — no TakeOrdered (the per-round argmax) and no
    // shuffled join. A regression here re-trains per query or shuffles
    // the corpus on the word key.
    SparkEntry.queries("t31_bpe_train")(spark, dir).collect() // warm the cache
    val p = plan("t32_bpe_apply")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
    // exactly one parquet scan: the documents token stream (formatted
    // explain lists each scan's Location once in the detail section)
    assert(p.linesIterator.count(_.contains("Location: InMemoryFileIndex")) == 1, p)
  }

  test("peak concurrency joins its 5-row peak frame by broadcast") {
    val p = plan("q52_peak_concurrency")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the sweep itself must not fall back to a skewed per-type window:
    // RankOps materializes via RDD, so no WindowExec may appear at all.
    assert(!p.contains("Window"), p)
  }

  test("d15 probes the cached shingle stream: no generator in the query plan") {
    // the positional shingle index is checkpointed once per (session,
    // dir); both the multiplicity aggregate and the join probe must read
    // the materialized blocks, never re-run shingle_explode.
    graft.ext.TextQueries.posShingles(spark, dir) // warm the index
    val p = plan("d15_dup_spans")
    assert(!p.contains("Generate"), p)
  }

  test("t25 ranks per language through RankOps — no window, one range exchange") {
    // the CCNet tercile must NEVER plan a `PARTITION BY lang` window
    // (few languages = few reducers at 100 TB): per-language rank comes
    // from RankOps' materialized range partition (Scan ExistingRDD) plus
    // broadcast counts, and the ONLY range exchange is the harness sort
    // on doc_id.
    val p = plan("t25_ccnet_buckets")
    assert(!"\\bWindow\\b".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert("rangepartitioning".r.findAllIn(p).size == 1, p)
  }

  test("s27 power-iteration rounds scan ONLY the checkpointed quantized matrix") {
    // the rounds are RDD partial aggregations (r16 — see
    // powerRoundExact): the only plan to audit is the matrix itself,
    // which must be the once-checkpointed ExistingRDD blocks — a
    // parquet scan here would mean every round re-reads + re-quantizes
    // the embeddings (3x the corpus I/O). Arithmetic equivalence of the
    // RDD round is pinned by PropertySpec's BigInteger reference test.
    // xm is a shared (session, dir) cache since r15 — never released by
    // consumers (DirCaches owns the blocks)
    val p = graft.ext.SimilarityQueries.powerQuantized(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("s30 probes the checkpointed adaptive band index through a bounded heap") {
    // candidate generation must read the materialized scaled-band blocks
    // (no per-query re-hash of the 16 planes) and take top-k per vector
    // via WindowGroupLimit — never a global or per-key full sort.
    graft.ext.SimilarityQueries.scaledBandIndex(spark, dir) // warm
    val p = plan("s30_ann_hubness")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("dot_product"), s"plane hashing must be amortized into the index:\n$p")
  }

  test("s32 broadcasts the probe table against the checkpointed index") {
    // the probe table is |sample|·L·(b+1) rows (corpus-size-independent)
    // and must BROADCAST into the candidate join so the corpus-grain
    // index side never shuffles for it; pairs then rank through the
    // bounded WindowGroupLimit heap. The probe-key fan-out is the one
    // Generate-over-index Posexplode.
    graft.ext.SimilarityQueries.scaledBandIndex(spark, dir) // warm
    val p = plan("s32_multiprobe_recall")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Posexplode") || p.contains("Generate"), p)
  }

  test("s33 probes the checkpointed standing index; top-k through the bounded heap") {
    // admission must read the materialized standing band rows (no
    // per-batch re-hash of the plane family) and rank per new vector via
    // WindowGroupLimit — the batch-bounded ingest shape.
    graft.ext.SimilarityQueries.standingBandIndex(spark, dir) // warm
    val p = plan("s33_incremental_ann")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("dot_product"), s"plane hashing must be amortized into the index:\n$p")
  }

  test("d30 warm probe is a broadcast of the converged component labels") {
    // the edge build + BSP loop run once into the (session, dir) label
    // cache; the warm query is id-column scan + broadcast label join —
    // no cosine, no band self-join, no loop machinery in the plan.
    graft.ext.DedupQueries.annDedup(spark, dir).count() // converge + cache
    val p = plan("d30_ann_dedup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("cosine_sim") && !p.contains("SortMergeJoin"), p)
  }

  test("s34 probe join strategy is AQE's runtime pick, never a forced broadcast") {
    // the multi-probe admission probe table scales with the BATCH — a
    // force-broadcast would ship a corpus-fraction bulk admission to
    // every executor, so the operator leaves the (bid, pkey) equi-join
    // unhinted and AQE picks from the probe side's runtime size. The
    // static plan must therefore carry NO broadcast exchange on the
    // bucket join; after execution the final adaptive plan shows AQE
    // converted the fixture's small probe side to a broadcast join.
    // Plane hashing stays amortized into the checkpointed standing
    // index and the top-k rides the bounded WindowGroupLimit heap.
    graft.ext.SimilarityQueries.standingBandIndex(spark, dir) // warm
    val df = SparkEntry.queries("s34_incremental_ann_mp")(spark, dir)
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Posexplode") || p.contains("Generate"), p)
    assert(!p.contains("dot_product"), s"plane hashing must be amortized into the index:\n$p")
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("BroadcastHashJoin"),
      s"AQE should broadcast the fixture-sized probe side at runtime:\n$fin")
  }

  test("s35 admission-recall probe table broadcasts; exact side broadcasts the sample") {
    graft.ext.SimilarityQueries.standingBandIndex(spark, dir) // warm
    val p = plan("s35_admission_recall")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("dot_product"), s"plane hashing must be amortized into the index:\n$p")
  }

  test("d31 warm probe is a broadcast of the converged multi-probe component labels") {
    // same warm contract as d30: the multi-probe edge build + BSP loop
    // run once into the (session, dir) label cache; the registered query
    // is id-scan + broadcast label join.
    graft.ext.DedupQueries.annDedupMultiprobe(spark, dir).count() // converge
    val p = plan("d31_ann_dedup_mp")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("cosine_sim") && !p.contains("SortMergeJoin"), p)
  }

  test("d32 membership joins ride the checkpointed index and truth frames") {
    // truth is a (session, dir) checkpoint (it is read three times in
    // the one query); both candidate membership sides read the
    // materialized band rows — no plane re-hash in the readout.
    graft.ext.DedupQueries.mpDedupRecall(spark, dir).count() // build truth
    val p = plan("d32_mp_dedup_recall")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("dot_product"), s"plane hashing must be amortized into the index:\n$p")
  }

  test("d33 composes off the checkpointed range index: no re-shingle, pruned dim scan") {
    // the d28∘d25 composition must NOT re-run detection: both sides read
    // the materialized span-grain rows; the only corpus touch is the
    // (doc_id, source) dimension projection — assert the documents scan
    // is pruned to those two columns and no Generate (shingling) or
    // gaps-and-islands Window appears.
    graft.ext.DedupQueries.cutRanges(spark, dir).count() // build the index
    val p = plan("d33_provenance_cut")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Generate"), p)
    assert(!"\\bWindow\\b".r.findAllIn(p).hasNext, p)
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("source") && !read.contains("text"), read)
  }

  test("d27 probes the checkpointed range index: no window, no join, no generate") {
    // the fingerprint-annotated range frame is a build-once (session,
    // dir) checkpoint (gaps-and-islands window, dup-position semi-join
    // and the span-slicing document join all run at build, over the
    // cached positional shingle index); the warm d27 query itself is a
    // projection + total-order sort over the materialized rows.
    graft.ext.DedupQueries.cutRanges(spark, dir).count() // build the index
    val p = plan("d27_cut_ranges")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Generate"), p)
    assert(!"\\bWindow\\b".r.findAllIn(p).hasNext, p)
    assert(!p.contains("Join"), p)
  }

  test("d29 applies cuts as a per-row HOF: no range join, no window") {
    // the apply stage on top of d28 adds ONE bounded collect_list
    // aggregate, ONE doc_id equi-join onto documents, and a Generate
    // (the single-evaluation `inline`); the exists-over-ranges test is
    // a lambda over the doc's own collected array — it must never plan
    // as a nested-loop/cartesian range join, and the gaps-and-islands
    // window lives in the checkpointed range index, not in this plan
    // (both d28 references read the same materialized frame).
    graft.ext.DedupQueries.cutRanges(spark, dir).count() // build the index
    val p = plan("d29_cut_apply")
    assert(!"\\bWindow\\b".r.findAllIn(p).hasNext, p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size == 1, p)
    assert("\\(\\d+\\) ObjectHashAggregate".r.findAllIn(p).size >= 1, p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("m9 computes totals and runs in one tree (single scan, no self-join)") {
    val p = plan("m9_quiet_runs")
    assert(!p.contains("Join"), p)
    // exactly one generate (the frame explode) — a totals+runs self-join
    // shape would show two.
    assert("\\(\\d+\\) Generate".r.findAllIn(p).size <= 1, p)
  }

  test("p27 funnel is ONE aggregate pass over the flag frame (stack, not 8 count jobs)") {
    // the cumulative stage counts must come from a single global
    // aggregate of the per-doc flag conjunctions, unpivoted by stack
    // (one Generate) — eight separate count() jobs would show eight
    // aggregate trees; the near-dup label sides ride their converged
    // (session, dir) caches as broadcast joins, never a re-run BSP loop.
    graft.ext.DedupQueries.dedupClusters(spark, dir).count()          // converge
    graft.ext.DedupQueries.annDedupMultiprobe(spark, dir).count()     // converge
    // the registered query reads the (session, dir) flag checkpoint
    // since r15 (plan = agg over ExistingRDD) — audit the lazy
    // assemble+funnel plan, the shape the checkpoint materializes
    import graft.pipelines.TrainingDataPipeline
    val flags = TrainingDataPipeline.assembleFlags(spark, dir,
      TrainingDataPipeline.gateFrames(spark, dir)
        .map { case (n, th) => n -> th() }.toMap)
    val p = TrainingDataPipeline.funnelOf(flags)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // exactly one stack unpivot, fed by ONE single-partition exchange —
    // the global partial/final aggregate pair carrying all 8 conditional
    // sums in one 8-column row (upstream gates keep their own Generates:
    // the trigram/shingle explodes)
    assert("stack\\(8".r.findAllIn(p).size == 1, p)
    assert("SinglePartition".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mixture audit aggregates map-side before its single shuffle") {
    val p = plan("p5_mixture")
    // Partial + final HashAggregate around one hash shuffle; the keep
    // predicate itself adds no exchange.
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("salted join stays a broadcast join with partial aggregation") {
    // Salting must not push the replicated dimension over the broadcast
    // threshold into a sort-merge join — that would trade skew for a
    // full shuffle of the fact side.
    val p = plan("q56_salted_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("bloom join filters the fact side BEFORE the join, with native codegen probe") {
    val p = plan("q57_bloom_join")
    // The bloom probe must be a Filter in the fact branch BELOW the join
    // (formatted-plan node ids are post-order: every input has a lower id
    // than its consumer) — pruning after the join would move every row
    // through the shuffle anyway.
    val bloomFilterIds = p.split("\n\n").toSeq.collect {
      case b if b.contains(") Filter") && b.contains("might_contain") =>
        "\\((\\d+)\\)".r.findFirstMatchIn(b).get.group(1).toInt
    }
    val joinIds = "\\((\\d+)\\) \\w*Join".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    assert(bloomFilterIds.nonEmpty, s"no might_contain bloom filter block in plan:\n$p")
    assert(joinIds.nonEmpty && bloomFilterIds.min < joinIds.min,
      s"bloom filter node ${bloomFilterIds.min} must precede join ${joinIds.min}:\n$p")
    // The probe is the NATIVE BloomFilterMightContain expression — no
    // Scala UDF breaking whole-stage codegen on the fact scan.
    assert(!p.contains("UDF"), s"bloom probe must not be a Scala UDF:\n$p")
    assert(!p.contains("BatchEvalPython"), p)
  }

  test("s11 probe joins only against broadcasts over the packed checkpointed index") {
    // The r7→r8 fix: the per-probe plan must read the PRE-JOINED
    // (vec_id, cell, sub, cid) posting index (a checkpointed ExistingRDD
    // scan) and never re-run the corpus-grain cellIndex ⋈ pqAssign join
    // at probe time — every join in the probe is a broadcast (probe
    // cells, 32-row ADC table, 10-row re-rank), so the only exchange
    // carrying corpus-derived rows is the post-ADC partial-aggregate one.
    val p = plan("s11_ivfpq")
    assert(p.contains("Scan ExistingRDD"), p)       // checkpointed index
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("sharded distinct never plans a global or per-key distinct buffer") {
    val p = plan("q58_sharded_distinct")
    // Two partial/final aggregate pairs (shard level + key level); no
    // Expand-based single distinct whose reducer holds a hot key's set.
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("z-order layout narrows its projection before the range exchange") {
    val p = plan("p6_zorder")
    // The wide events payload (props, event_type, value) must be pruned
    // at the scan: only the curve inputs ride the range shuffle.
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("props") && !read.contains("value"), read)
  }

  test("kmeans step assigns without a window or per-vector shuffle") {
    val p = plan("s14_kmeans_step")
    // Assignment is a literal-centroid projection: the old cross-join +
    // row_number formulation would show a Window here and shuffle the
    // k-per-vector frame on vec_id.
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p) // stats frame onto centroids
  }

  test("bm25 probes the tf index with broadcast df/stats and a bounded top-k") {
    val p = plan("t14_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pmi joins only vocabulary-sized frames, all broadcast") {
    val p = plan("t15_pmi")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("event trigrams: one user window, map-side partials, bounded top-k") {
    val p = plan("q62_event_ngrams")
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("mad outliers broadcast the per-segment median/MAD frames") {
    val p = plan("q63_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("scene cuts: join-free single tree over the frame stream") {
    val p = plan("m10_scene_cuts")
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("temperature mixture reduces map-side and broadcasts the totals row") {
    val p = plan("p14_temperature")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("kmv overlap builds sketches via bounded-heap partial aggregation") {
    graft.functions.GraftFunctions.register(spark)
    val p = plan("q65_sketch_overlap")
    // topk_pairs is a TypedImperativeAggregate: partial+final ObjectHashAggregate,
    // k entries per type across the shuffle — never a per-type sort.
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cusum is window algebra on one user shuffle — no join, no fold, no extra exchange") {
    val p = plan("q66_cusum")
    assert(!p.contains("Join"), p)
    assert("Window".r.findAllIn(p).size >= 1, p)
    // The running windows, the per-user aggregate and AQE reuse one
    // user_id hash exchange; only the harness sort ranges on top.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("containment join probes the checkpointed index (no re-shingle) and never sort-merges") {
    // Force the index build, then audit the steady-state plan.
    SparkEntry.queries("d16_containment")(spark, dir).count()
    val p = plan("d16_containment")
    assert(!p.contains("SortMergeJoin"), p)
    // All three joins (prefix x postings, cand x sets x sets) stay hash joins
    // over the LogicalRDD leaves of the checkpointed indexes - no Generate
    // re-deriving shingles from text inside this plan.
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("documents.parquet"), p)
  }

  test("novelty reuses the shingle index and reduces df map-side before the broadcast-back") {
    SparkEntry.queries("t18_novelty")(spark, dir).count()
    val p = plan("t18_novelty")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
    assert(!p.contains("documents.parquet"), p)
  }

  test("merge intervals is one user shuffle: window sort then partial/final aggregate") {
    val p = plan("q64_merge_intervals")
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("Join"), p)
    // One hash exchange for the window, one for the final agg, plus the
    // harness sort - never an interval self-join.
    assert("hashpartitioning\\(".r.findAllIn(p).size <= 2, p)
  }

  test("priority survivor is a single partial/final aggregate, no window in the plan") {
    val p = plan("p16_priority_survivor")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("rank battery rides one priority shuffle for all six ranking functions") {
    val p = plan("q74_rank_distribution")
    assert(!p.contains("Join"), p)
    // One hash exchange feeds every Window (the orders share the
    // priority partitioning); the only other exchange is the harness
    // output sort.
    assert("hashpartitioning\\(".r.findAllIn(p).size == 1, p)
    assert("Window".r.findAllIn(p).size >= 3, p)
  }

  test("auc: conversion flags broadcast onto the dim, one segment window, map-side partials") {
    val p = plan("q75_auc")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("last-touch attribution is join-free: one user window shuffle then a channel rollup") {
    val p = plan("q76_last_touch")
    assert(!p.contains("Join"), p)
    // user-window exchange + channel-agg exchange only (plus the range
    // exchange of the output sort, which is not hashpartitioning)
    assert("hashpartitioning\\(".r.findAllIn(p).size == 2, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("multi-touch attribution is join-free: carried window + group window + rollup") {
    val p = plan("q77_multitouch")
    assert(!p.contains("Join"), p)
    // TWO hash exchanges only: the user-carry window's
    // hashpartitioning(user_id) already satisfies the second window's
    // (user_id, p_id) clustering (subset rule), so the position window
    // inserts just a sort — then the channel agg exchange.
    assert("hashpartitioning\\(".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("decay score broadcasts the 1-row anchor and reduces map-side") {
    val p = plan("q78_decay_score")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("erasure cascade: every tombstone join broadcasts, fact sides never shuffle") {
    val p = plan("q79_erasure_cascade")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("lateness audit never funnels through one task (no single-partition window)") {
    val p = plan("q80_lateness_audit")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("tpch q3: filtered customer broadcasts, top-10 is a bounded heap") {
    val p = plan("q81_tpch3")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("tpch q5: every dimension broadcasts; only the order-key spine shuffles") {
    val p = plan("q82_tpch5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin") ||
      "SortMergeJoin".r.findAllIn(p).size == 1, p)
  }

  /** The scale-survival property the raw hints lacked: customer/supplier
    * grow with the fact data, so their broadcasts are size-gated on the
    * session's autoBroadcastJoinThreshold. When the dimension exceeds the
    * threshold (simulated here by setting it below any table's size) the
    * hint is WITHHELD and the plan degrades to a shuffle join instead of
    * pinning a 100 TB-scale driver collect; the schema-bounded
    * nation/region hints (25/5 rows) stay forced. */
  test("tpch q5/q10: scale-growing dimension broadcasts degrade to shuffle joins below threshold") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")  // 1 byte: every size-gated hint must withhold
      val p5 = plan("q82_tpch5")
      assert(p5.contains("SortMergeJoin") || p5.contains("ShuffledHashJoin"), p5)
      // nation/region raw hints survive the threshold (bounded by schema)
      assert("BroadcastHashJoin".r.findAllIn(p5).size >= 2, p5)
      val p10 = plan("q83_tpch10")
      assert(p10.contains("SortMergeJoin") || p10.contains("ShuffledHashJoin"), p10)
    } finally spark.conf.set(key, prev)
  }

  test("tpch q10: customer scan prunes to the four output columns") {
    val p = plan("q83_tpch10")
    val custScan = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("c_custkey")).mkString
    assert(custScan.contains("c_name") && !custScan.contains("c_comment") &&
      !custScan.contains("c_mktsegment"), custScan)
  }

  test("tpch q4: the exists probe stays a LEFT SEMI join") {
    val p = plan("q84_tpch4")
    assert(p.contains("LeftSemi"), p)
  }

  test("tpch q18: aggregate first, then the shrunken key set broadcasts") {
    val p = plan("q85_tpch18")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("tpch q22: integer-mean scalar broadcast and a LEFT ANTI probe") {
    val p = plan("q86_tpch22")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("tpch q21: ONE lineitem pass — per-order counts, no EXISTS/NOT-EXISTS self-joins") {
    // r16: the semi/anti self-joins (3 lineitem scans, 3 fact shuffles)
    // collapsed into one (orderkey, suppkey) grouped pass plus a
    // per-order window that rides the same partitioning — both subquery
    // conditions are per-order facts. Pin: exactly one lineitem scan,
    // no self-join of the fact, the window partitioned by the
    // high-cardinality orderkey (never a dimension key).
    val p = plan("q88_tpch21")
    assert(p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem")) == 1,
      "lineitem must be scanned exactly once\n" + p)
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("\\bWindow\\b".r.findAllIn(p).nonEmpty, p)
  }

  test("tpch q20: correlated scalar agg decorrelates to ONE grouped pass") {
    val p = plan("q89_tpch20")
    assert(p.contains("LeftSemi"), p)
    // Single (suppkey, partkey) aggregation computing both sums: exactly
    // one partial/final pair over lineitem keys (plus the distinct over
    // suppkey), never two fact-side shuffles.
    val aggLines = p.linesIterator.filter(l =>
      l.contains("HashAggregate") && l.contains("l_partkey")).toSeq
    assert(aggLines.size <= 2, aggLines.mkString("\n"))
  }

  test("cdc chunking: fingerprints join hash-to-hash, no nested-loop anywhere") {
    val p = plan("m11_cdc_chunks")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert("Aggregate".r.findAllIn(p).size >= 2, p)
  }

  test("merge apply: both sides compact before the single full-outer key join") {
    val p = plan("q87_merge_apply")
    assert(p.contains("FullOuter"), p)
    // two compactions (max_by plans as SortAggregate), each with a
    // partial/final split, all BEFORE the join sees a row
    assert("Aggregate".r.findAllIn(p).size >= 4, p)
  }

  test("windowed stream replay is one shuffle with map-side partials") {
    val p = plan("r_stream_window_replay")
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("session replay plans a session-window aggregate, not a cross product") {
    val p = plan("r_stream_session_replay")
    assert(!p.contains("Join"), p)
    assert(p.toLowerCase.contains("session"), p)
  }

  private def scanCount(p: String): Int =
    """\(\d+\) Scan parquet""".r.findAllIn(p).size

  test("tpch q1: one pruned scan, map-side partials, integer means") {
    val p = plan("q90_tpch1")
    assert(scanCount(p) == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_returnflag") && !read.contains("l_orderkey"), read)
  }

  test("tpch q2: the per-part min is a window, not a join-back double scan") {
    val p = plan("q91_tpch2")
    // exactly one scan per relation: lineitem, part, supplier, nation —
    // the min-cost correlation must NOT recompute the supply subtree
    assert(scanCount(p) == 4, p)
    assert(p.contains("Window"), p)
  }

  test("tpch q11/q15: the scalar total reuses the grouped exchange (one fact scan)") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      // exchange reuse surfaces in the static plan with AQE off; with AQE
      // on the same dedup happens at runtime via the stage cache
      spark.conf.set(key, "false")
      assert(plan("q95_tpch11").contains("ReusedExchange"), plan("q95_tpch11"))
      assert(plan("q99_tpch15").contains("ReusedExchange"), plan("q99_tpch15"))
    } finally spark.conf.set(key, prev)
  }

  test("tpch q13: customer keeps zero-order rows through a LEFT OUTER join") {
    val p = plan("q97_tpch13")
    assert(p.contains("LeftOuter"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // custkey agg + histogram agg
  }

  test("tpch q16: the exclusion probe stays LEFT ANTI before the distinct count") {
    val p = plan("q100_tpch16")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch q17: correlated avg is a window over one brand-pruned scan") {
    val p = plan("q101_tpch17")
    assert(scanCount(p) == 2, p) // lineitem + part, never lineitem twice
    assert(p.contains("Window"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("tpch q19: disjunction pushes to the part scan, equi-key stays clean") {
    val p = plan("q102_tpch19")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the brand/size OR reaches the part scan as a pushed filter
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("Or("), pushed)
    // one join, not a union of three brand-specific joins
    assert(scanCount(p) == 2, p)
  }

  test("gopher gate is a pure projection: no join, no aggregate exchange") {
    val p = plan("t22_gopher_gate")
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
    // only the harness sort exchanges (count the detail headers, which
    // appear once per operator — tree lines would double-count)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*")) <= 1, p)
  }

  test("dsir weight table joins back by broadcast; doc sums combine map-side") {
    val p = plan("t23_dsir")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // per-doc sums split partial/final around the doc_id shuffle
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("retrieval eval broadcasts the query set and caps top-k pre-shuffle") {
    val p = plan("s17_retrieval_eval")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // per-query top-k is a WindowGroupLimit (partial per-partition heap
    // before the q_id shuffle), not a full per-query sort
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("source cap never sorts the full corpus per source") {
    val p = plan("p18_source_cap")
    // the top-N side is WindowGroupLimit-bounded; the corpus-side flag is
    // a broadcast-threshold comparison, not a second window
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) <= 1, p)
  }

  test("threshold sweep probes the cached pair frame, never rescanning the corpus") {
    val p = plan("d20_threshold_sweep")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("phash pairs join on hash buckets, never a cartesian hamming scan") {
    val p = plan("m13_phash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("snapshot reconstruction is one scan + hash aggregate, no window") {
    val p = plan("q104_snapshots")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_max") || p.contains("partial_"), p)
  }

  test("embedding drift aggregates map-side; only tiny frames join") {
    val p = plan("s18_embedding_drift")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("lpa rounds broadcast the label frame across the edge list") {
    val p = plan("d19_lpa")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("semdedup reuses the checkpointed assignment and joins inside the cluster") {
    val p = plan("d18_semdedup")
    // the candidate join is an equi-join (cluster key), never a cross join
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the assignment index is probed from its checkpoint, not rebuilt:
    // no parquet scan of embeddings for the assignment side
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("seeded shuffle ranks via the range-partition primitive, never a global window") {
    val p = plan("p19_seeded_shuffle")
    // the RankOps pass surfaces as an RDD scan; a single-task
    // row_number() OVER (ORDER BY ...) would show an empty-key Window
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Window"), p)
  }

  test("shard balance ranks via the range-partition primitive, never a global window") {
    val p = plan("p25_shard_balance")
    // the serpentine deal is projection arithmetic over the RankOps
    // global rank (range partition + per-partition offsets); a
    // single-task row_number() OVER (ORDER BY ...) would show an
    // empty-key Window
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("bpe packing rides the cached segmentation and the range-partition prefix sum") {
    // the trained segmentation must come from the t31/t32 checkpoint
    // (never a retrain — no TakeOrdered in this plan) and the running
    // prefix is RankOps (Scan ExistingRDD), never a single-task window.
    SparkEntry.queries("t32_bpe_apply")(spark, dir).collect() // warm cache
    val p = plan("p26_bpe_packing")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("TakeOrderedAndProject"), p)
  }

  test("length buckets is one projection + one tiny hash aggregate") {
    val p = plan("p20_length_buckets")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial_"), p)
    // column pruning: only `text` leaves the scan
    assert(p.contains("ReadSchema: struct<text:string>"), p)
  }

  test("bow dedup is a single map-side-combined hash aggregate") {
    val p = plan("d22_bow_dedup")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial_"), p)
  }

  test("silhouette never shuffles the corpus: literal centroids, 10-group agg") {
    val p = plan("s20_silhouette")
    // centroid table is folded in as a literal — no join anywhere
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
  }

  test("zone-map audit is one corpus scan + metadata-scale passes") {
    val p = plan("q106_zonemap")
    // the event log is scanned once per audit branch at most — the
    // predicate battery must NOT scan per predicate x zone
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("silence trim is explode + one conditional aggregate, no window") {
    val p = plan("m14_silence_trim")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.contains("partial_"), p)
  }

  test("corpus diff joins 16-byte hash manifests, never payloads") {
    val p = plan("p21_corpus_diff")
    // full-outer on a high-cardinality key is the one sort-merge join we
    // WANT here (both sides corpus-sized — nothing to broadcast)
    assert(p.contains("SortMergeJoin"), p)
    // the text payload is digested to h_old/h_new BELOW the exchange:
    // no shuffle write carries a text column
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach {
      l => assert(!l.contains("text#"), s"payload crosses the shuffle: $l")
    }
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("calibration scores with literal weights: no join before the decile rank") {
    val p = plan("s21_calibration")
    assert(!p.contains("Join"), p)
    // the decile pass rides the RankOps RDD, not an empty-key window
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 0, p)
  }

  test("layout what-if ranks the clustered layout via RankOps, no global window") {
    val p = plan("q107_layout_whatif")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("soft dedup has no forced broadcast: sizes scale with cluster count") {
    // the sizes frame is ~one row per cluster — corpus-scale at 100 TB —
    // so the join must carry NO broadcast() hint; AQE may still choose
    // broadcast at fixture scale, and the shuffle fallback keys both
    // sides on cluster_root. Either join is fine; a cross join is not.
    val p = plan("d23_soft_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("Join"), p)
  }

  test("cas savings re-aggregates the checkpointed chunk frame, no re-chunk") {
    val p = plan("m15_cas_savings")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
  }

  test("compaction plan windows the manifest, never the corpus") {
    val p = plan("p22_compaction_plan")
    // exactly one Window pass (the metadata prefix sum over the manifest)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 1, p)
  }

  test("k-anonymity is one hash aggregate with pruned input") {
    val p = plan("q108_kanonymity")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains(
      "ReadSchema: struct<c_nationkey:int,c_acctbal:double,c_mktsegment:string>"), p)
  }

  test("growth accounting shares one user shuffle between lag and churn") {
    val p = plan("q109_growth_accounting")
    // the only permitted sort-merge join is the final week-keyed FULL
    // OUTER between the two per-week rollups — both sides are
    // |weeks|-row aggregates, metadata-scale at any corpus size (the
    // full outer is what keeps idle weeks' churn rows in the ledger)
    assert("\\(\\d+\\) SortMergeJoin".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("SortMergeJoin") || p.contains("SortMergeJoin FullOuter"), p)
    // the distinct + two windows + rollups — user_id exchanges only
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(l.contains("user_id") || l.contains("week"), l)
    }
  }

  test("mixture order runs both ranks through RankOps, no per-source window") {
    val p = plan("p23_mixture_order")
    // the final position rank is a RankOps RDD (everything upstream —
    // the group rank and the broadcast weight join — is inside its
    // lineage, behind the createDataFrame boundary); what must NOT
    // appear is any window or sort-merge join in the visible plan
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 0, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("isotropy audit is one map-side-combined dim aggregate") {
    val p = plan("s23_isotropy")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p)
  }

  test("equi-depth stats ride the RankOps rank, no single-reducer ntile window") {
    val p = plan("q113_equidepth_stats")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 0, p)
  }

  test("fk audit plans every relationship as an anti join, dims broadcast") {
    val p = plan("q114_fk_audit")
    assert("LeftAnti".r.findAllIn(p).size >= 5, p)
    // the four dimension-parent edges broadcast; only lineitem->orders
    // may legitimately shuffle both sides
    assert("BroadcastHashJoin .*LeftAnti".r.findAllIn(p).size >= 4, p)
  }

  test("pit join is an entity-keyed equi-join with the interval residual") {
    val p = plan("q111_pit_join")
    // the interval predicate must ride an equi-join on user_id, never a
    // nested-loop/cross interval join
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("pattern replay folds per user in one pass: no join, one key exchange") {
    val p = plan("r_stream_pattern_replay")
    assert(!p.contains("Join"), p)
    // batch execution lowers flatMapGroupsWithState to MapGroups
    assert(p.contains("MapGroups"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*")) <= 2, p)
  }

  test("zipf fit ranks the vocabulary via RankOps, never a single-task window") {
    // a web-scale vocabulary is 1e8-1e9 terms; a global
    // row_number() OVER (ORDER BY c) would sort it on ONE executor
    val p = plan("t16_zipf")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 0, p)
  }

  /** The d17 BSP-round hint policy: the frontier broadcast is size-gated
    * (withheld above the session threshold — round 1 of a 10 %-of-corpus
    * seed set is corpus-scale), and the monotonically-growing `visited`
    * anti-join side carries NO hint at any threshold, so it degrades to
    * a co-partitioned shuffle anti-join exactly when stats say it must —
    * the same proof q82/q83's dimensions got. */
  test("bfs round: gated frontier broadcast, unhinted visited side degrades to shuffle") {
    import org.apache.spark.sql.execution.ExplainMode
    val und = spark.range(2000).selectExpr("id AS doc_a", "(id + 1) % 2000 AS doc_b")
    val seed = spark.range(200).selectExpr("id * 10 AS doc_id", "0L AS hops")
    def roundPlan(): String = graft.ext.DedupQueries.bfsRound(und, seed, seed)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // default threshold: the tiny frontier broadcasts (the fast path)
    assert(roundPlan().contains("BroadcastHashJoin"), roundPlan())
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1") // every frame is now "too big to broadcast"
      val p = roundPlan()
      // the gate withholds the frontier hint and the visited side was
      // never hinted: NOTHING broadcasts, both joins shuffle
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert("(SortMergeJoin|ShuffledHashJoin).*LeftAnti".r.findAllIn(p).nonEmpty, p)
    } finally spark.conf.set(key, prev)
  }

  test("source overlap probes a checkpointed posting index; pairs explode map-side, sizes broadcast") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    val prevAqe = spark.conf.get(aqe)
    try {
      spark.conf.set(key, "-1") // auto-broadcast off: only FORCED hints survive
      spark.conf.set(aqe, "false")
      graft.ext.TextQueries.sourceOverlap(spark, dir).count() // build posting
      val p = plan("t27_source_overlap")
      // exactly the two |sources|-row size frames carry forced hints
      // (each physical node appears twice in formatted output: once in
      // the tree, once in the detail section — count detail headers)
      assert("\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).size == 2, p)
      // the posting build (explode + distinct + collect_set) ran ONCE
      // into the (session, dir) checkpoint: the warm plan reads the
      // materialized index on all three branches — no ObjectHashAggregate,
      // no doc-grain join, no vocabulary self-join (the 100x blow-up
      // measured the un-materialized form paying the posting exchange
      // ~2x because static ReusedExchange does not match across branches)
      assert(p.contains("Scan ExistingRDD"), p)
      assert(!p.contains("ObjectHashAggregate"), p)
      assert(!p.contains("SortMergeJoin"), p)
      // pair generation is a Generate (explode) over the posting, not a join
      assert(p.contains("Generate"), p)
    } finally {
      spark.conf.set(key, prev)
      spark.conf.set(aqe, prevAqe)
    }
  }

  test("winnowing is a pure per-row projection: no join, no window, no hash exchange") {
    val p = plan("t29_winnowing")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // only the final total-order sort exchanges; nothing hash-partitions
    assert(!p.contains("Exchange hashpartitioning"), p)
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("text") && !read.contains("props"), read)
  }

  test("magic sniff rides the scan: prefix classify in the projection, one tiny agg") {
    val p = plan("m17_magic_sniff")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial_"), p)
  }

  test("attribution pairs touches per user, never a time cross join") {
    val p = plan("q118_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the band predicate rides the user_id equi-join as a residual
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(l.contains("user_id") || l.contains("p_id"), l)
    }
  }

  test("bitemporal grid broadcasts; per-user state is a map-side-combined struct max") {
    val p = plan("q119_bitemporal")
    // the 4-row cutoff grid rides a broadcast join; the corpus never
    // sort-merges against it, and the argmax is partial-aggregated
    // (never a window over the log)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_max"), p)
    assert(p.linesIterator.count(_.matches("\\(\\d+\\) Window$")) == 0, p)
  }

  test("mutual information marginalizes the cached contingency, never re-scans events") {
    val p = plan("q121_mutual_info")
    // all aggregates read the checkpointed 3-way grid
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Scan parquet"), p)
    assert(!p.contains("Window"), p)
  }

  test("hubness rides the bounded per-key kNN heap, no global sort before the histogram") {
    val p = plan("s26_hubness")
    // Spark 4 rewrites rank-filter windows into WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("chunk pairs: df-capped frame feeds the self-join, count frames never forced") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = plan("m16_chunk_pairs")
      // no forced hint anywhere: the per-doc count frames are
      // corpus-scale and join co-partitioned on the doc id
      assert(!p.contains("BroadcastHashJoin"), p)
      // the quadratic-fanout guard (df <= MaxChunkDf) is applied while
      // BUILDING the cached candidate frame — both self-join branches
      // read the already-capped checkpoint (Scan ExistingRDD), so the
      // cap structurally precedes the join; assert the join inputs are
      // the checkpoint scans, not a recomputed uncapped chunk stream
      assert(p.contains("Scan ExistingRDD"), p)
      // and the cap really is inside the cached frame's build plan
      val rarePlan = graft.ext.MultimodalQueries.rareChunksForAudit(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(rarePlan.contains(s"<= ${graft.ext.MultimodalQueries.MaxChunkDf}"), rarePlan)
    } finally spark.conf.set(key, prev)
  }

  test("nn-descent: every join is a hash equi-join, top-K stays in the bounded group-limit heap") {
    // the pivot self-join and both scoring joins must be equi-joins on
    // vec ids (the linear-mass argument needs hash partitioning, never
    // a product), G0 feeds the round through its checkpoint (built
    // once, read three times), and each rank<=K filter plans as
    // WindowGroupLimit — per-key bounded heaps, no global sort.
    // Audited on the graph pair, not the registered readout — the
    // readout's 1-row stat crossJoins legitimately plan as nested-loop
    // over singleton frames.
    // the cached round frame is an ExistingRDD since r15 — audit the
    // lazy round plan over the checkpointed base
    val p = graft.ext.SimilarityQueries.descentRoundLazy(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("s40 bucket cap: the occ_rk filter plans as a bounded per-bucket group limit") {
    // the cap is the whole point — it must execute as WindowGroupLimit
    // (per-(bid,bkey) bounded heap) feeding a hash equi-self-join, never
    // a global sort or a product. Since r13 the s40/s41 readouts are
    // eager (per-cap checkpoints released as the 1-row stats land), so
    // the audit targets the shared KERNEL every capped consumer plans
    // through — cappedIndexOf over the band rows, self-joined on
    // (bid, bkey) exactly as scaledCandPairs does.
    import org.apache.spark.sql.functions.col
    val nb = graft.ext.SimilarityQueries.scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val idx = graft.ext.SimilarityQueries.cappedIndexOf(nb, 32)
    val pairs = idx.as("a").join(idx.as("b"),
      col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
        col("a.vec_id") < col("b.vec_id"))
    val p = pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("hash"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("GlobalSort"), p)
  }
}
