package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the clustered-fixture signal claims (r11 verdict #2) as a
  * regression test rather than a one-off measurement: on a planted
  * mixture-of-Gaussians corpus the ANN dial family must show (1) real
  * cluster structure, (2) monotone multi-probe recall that beats the
  * exact-bucket baseline, and (3) query-directed margin ordering at
  * least matching the blind Hamming shell at comparable candidate mass
  * — the property the sinusoid corpus could not express. */
class ClusteredFixtureSpec extends AnyFunSuite with graft.SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("clustered_fx").toString
    graft.ClusteredFixture.generate(spark, out, n = 2000L, k = 16, sigma = 0.33)
    out
  }

  test("planted corpus has within-cluster structure and cross-cluster noise") {
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".as("v"), $"label")
      .filter($"vec_id" < 300)
    val stats = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select(($"a.label" === $"b.label").as("same"),
        expr("cosine_sim(a.v, b.v)").as("c"))
      .groupBy("same").agg(avg($"c").as("mean_c"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(stats(true) > 0.6, s"within-cluster mean cosine ${stats(true)}")
    assert(stats(false) < 0.2, s"cross-cluster mean cosine ${stats(false)}")
  }

  test("multi-probe recall is monotone and closes well above the exact bucket") {
    val rows = SimilarityQueries.multiprobeRecall(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val (t0, t1, t2) = (rows("t0_single"), rows("t1_multi1"), rows("t2_multi2"))
    assert(t0 <= t1 && t1 <= t2, s"probe recall must be monotone: $t0 $t1 $t2")
    assert(t2 > t0, s"shells must add recall on clustered data: $t0 -> $t2")
    assert(t2 >= 950000L,
      s"depth-2 probing must close near-complete recall on clustered data: $t2 ppm")
  }

  test("zipf cluster sizes follow the planted power law, deterministically") {
    val out = java.nio.file.Files.createTempDirectory("zipf_fx").toString
    graft.ClusteredFixture.generate(spark, out, n = 20000L, k = 16,
      sigma = 0.33, zipf = 1.0)
    val sizes = spark.read.parquet(s"$out/embeddings.parquet")
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.size == 16, s"all 16 clusters populated: ${sizes.size}")
    // inverse-CDF over Zipf(1) weights: expected share of cluster c is
    // (1/(c+1)) / H(16); with n=20k the per-cluster counts concentrate
    // tightly, so a ±20% relative window pins the law without flaking
    val h16 = (1 to 16).map(1.0 / _).sum
    (0 until 16).foreach { c =>
      val want = 20000.0 / ((c + 1) * h16)
      assert(math.abs(sizes(c) - want) < want * 0.2 + 30,
        s"cluster $c size ${sizes(c)} vs expected ~$want")
    }
    // head dominates tail by roughly the planted 16:1 ratio
    assert(sizes(0) > sizes(15) * 8,
      s"power-law head/tail: ${sizes(0)} vs ${sizes(15)}")
    // determinism: a second generation is byte-identical row-wise
    val out2 = java.nio.file.Files.createTempDirectory("zipf_fx2").toString
    graft.ClusteredFixture.generate(spark, out2, n = 20000L, k = 16,
      sigma = 0.33, zipf = 1.0)
    val a = spark.read.parquet(s"$out/embeddings.parquet")
    val b = spark.read.parquet(s"$out2/embeddings.parquet")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "zipf fixture must be deterministic")
  }

  test("depth-2 probe candidates are a superset of depth 1 and buy recall") {
    // the production dial (SPARK_GRAFT_PROBE_DEPTH): depth 2 probes a
    // strict superset of keys (own + 1-bit ⊂ own + 1-bit + 2-bit), so
    // the candidate pair set must contain depth 1's entirely
    val d1 = SimilarityQueries.mpCandPairs(spark, dir, depth = 1)
    val d2 = SimilarityQueries.mpCandPairs(spark, dir, depth = 2)
    assert(d1.exceptAll(d2).isEmpty,
      "depth-1 candidates must all appear at depth 2")
    val (n1, n2) = (d1.count(), d2.count())
    assert(n2 > n1,
      s"two-bit shells must add candidates on clustered data: $n1 -> $n2")
  }

  test("forest star contraction preserves the full survivor components exactly") {
    // d31's scale path (mpForestEdges) replaces the full threshold-
    // passing pair set with per-partition min-root stars; the CONTRACT
    // is that global components are bit-identical to the full set's.
    // Ground truth: a driver-side union-find over every surviving pair
    // of the pair-grain reference kernel (mpEdges).
    val full = SimilarityQueries
      .mpEdges(spark, dir, DedupQueries.EmbDupThreshold)
      .select($"vec_id", $"nbr_id").collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent.update(c, r); c = nxt
      }
      r
    }
    full.foreach { e =>
      val (a, b) = (e.getLong(0), e.getLong(1))
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.update(rb, ra) else if (rb < ra) parent.update(ra, rb)
    }
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id").as[Long].collect()
    val d31 = DedupQueries.annDedupMultiprobe(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d31.keySet == vecs.toSet)
    vecs.foreach { v =>
      assert(d31(v) == find(v),
        s"canon of $v: forest path ${d31(v)} vs full survivor set ${find(v)}")
    }
    // and the contraction is a genuine reduction, not a rename
    val nForest = SimilarityQueries
      .mpForestEdges(spark, dir, DedupQueries.EmbDupThreshold).count()
    assert(nForest <= full.length,
      s"star edges $nForest must not exceed survivor pairs ${full.length}")
  }

  test("zipf connectivity contract: capped-direct shatters the head, multi-probe reconnects it") {
    // r14's zipf-500k measurement as a deterministic regression gate
    // (r14 verdict #5): on a power-law corpus whose head cluster
    // overflows DefaultBucketCap, d30's both-sides-capped direct rule
    // MUST break head reachability (evicted siblings share no bucket
    // residency) and d31's probe shells MUST restore it (every evicted
    // sibling still probes its own bucket's kept residents). sigma 0.05
    // plants near-identical siblings so bucket occupancy, not the
    // threshold, is the binding mechanism — the 500k run's regime at
    // mini scale.
    val out = java.nio.file.Files.createTempDirectory("zipf_conn").toString
    graft.ClusteredFixture.generate(spark, out, n = 4000L, k = 16,
      sigma = 0.05, zipf = 1.0)
    val labels = spark.read.parquet(s"$out/embeddings.parquet")
      .select($"vec_id", $"label")
    val head = labels.groupBy($"label").count()
      .orderBy(desc("count"), asc("label")).head().getInt(0)
    def compPerLabel(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"canon_id").join(labels, "vec_id")
        .groupBy($"label").agg(countDistinct($"canon_id").as("nc"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val d30 = compPerLabel(DedupQueries.annDedup(spark, out))
    val d31 = compPerLabel(DedupQueries.annDedupMultiprobe(spark, out))
    assert(d30(head) > 1L,
      s"cap must break direct head reachability here: ${d30(head)} components")
    d31.foreach { case (l, nc) =>
      assert(nc == 1L, s"multi-probe must collapse label $l to one component: $nc")
    }
    // forest-vs-full equivalence WHERE THE CAP BINDS: the 2k clustered
    // fixture never overflows a bucket, so only this corpus exercises
    // the contraction against capped+overflowing survivor sets — the
    // regime the kernel exists for
    val full = SimilarityQueries
      .mpEdges(spark, out, DedupQueries.EmbDupThreshold)
      .select($"vec_id", $"nbr_id").collect()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent.update(c, r); c = nxt
      }
      r
    }
    full.foreach { e =>
      val (a, b) = (e.getLong(0), e.getLong(1))
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.update(rb, ra) else if (rb < ra) parent.update(ra, rb)
    }
    val d31canon = DedupQueries.annDedupMultiprobe(spark, out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    d31canon.foreach { case (v, c) =>
      assert(c == find(v),
        s"forest canon of $v diverges from the full survivor set under a binding cap: $c vs ${find(v)}")
    }
  }

  test("capped text dedup holds identical-text connectivity past the bucket cap") {
    // the text twin of the zipf connectivity contract: on a power-law
    // documents corpus the head cluster's VERBATIM copies form one
    // identical-text group far larger than TextBucketCap — every band
    // bucket they share overflows the cap — yet because the probe side
    // is uncapped, every evicted copy still joins its bucket's kept
    // residents at Jaccard 1 and the group must land in ONE component.
    val out = java.nio.file.Files.createTempDirectory("zipf_docs").toString
    graft.ClusteredFixture.generateDocs(spark, out, n = 4000L, k = 16,
      zipf = 1.0)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val head = docs.groupBy($"text").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).head()
    assert(head.getLong(1) > DedupQueries.TextBucketCap,
      s"fixture must overflow the cap: ${head.getLong(1)} copies")
    val ids = docs.filter($"text" === head.getString(0))
      .select($"doc_id").as[Long].collect().toSet
    val canon = DedupQueries.cappedTextDedup(spark, out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.map(canon).size == 1,
      "identical-text group must stay one component under the cap")
  }

  test("collapsed recall grid: complete cells, bounded, and the dial is real") {
    // s42 re-scores s41's cells at duplicate-component grain (truth =
    // top-K OTHER components by best-member cosine). Structural
    // contract only — collapsed recall is NOT provably monotone in
    // candidate-set growth (a truth component whose best member is
    // unobserved can be displaced by a fully-observed weaker one), so
    // the spec pins shape, bounds, and the coarsest dial claim.
    val g = SimilarityQueries.collapsedCapProbeGrid(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cells = for (c <- Seq("cap_08", "cap_32"); d <- Seq("d0", "d1", "d2"))
      yield (c, d)
    assert(g.keySet == cells.toSet, s"grid cells: ${g.keySet}")
    // one shared exact denominator; hits bounded by it; ppm consistent
    assert(g.values.map(_._1).toSet.size == 1, "shared denominator")
    g.foreach { case (cell, (ne, nh, ppm)) =>
      assert(nh <= ne, s"$cell hits $nh > exact $ne")
      assert(ppm == nh * 1000000L / math.max(ne, 1L), s"$cell ppm arithmetic")
    }
    // the probe dial must buy collapsed recall on clustered data at the
    // production cap (depth 2 uncovers truth components' best members)
    assert(g(("cap_32", "d2"))._3 >= g(("cap_32", "d0"))._3,
      "depth must not lose collapsed recall at the production cap here")
    assert(g(("cap_32", "d2"))._3 > 0L, "fixture must yield nonzero recall")
  }

  test("derived pair partitions follow the candidate-mass bound") {
    import SimilarityQueries.{derivedPairPartitionsFor => f}
    // fixture scale: mass under one target-partition → session floor
    assert(f(6000L, 10, 1, 32) == 32)
    // the zipf-500k corpus (b=16, depth 1): mass = 500k·8·17·32 =
    // 2.176e9 rows → 544 partitions — the knob r14 hand-set to 512
    assert(f(500000L, 16, 1, 32) == 544)
    // depth 2 multiplies shells by C(b,2): hits the derivation clamp
    assert(f(500000L, 16, 2, 32) == SimilarityQueries.MaxDerivedPartitions)
    // a larger session conf is a floor, never lowered
    assert(f(500000L, 16, 1, 1024) == 1024)
  }

  test("query-directed margin ordering matches or beats the blind shell") {
    val rows = SimilarityQueries.queryDirectedRecall(spark, dir)
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(4)))).toMap
    val (margCand, margPpm) = rows("q1_margin")
    val (shellCand, shellPpm) = rows("t1_shell1")
    assert(margPpm >= shellPpm,
      s"margin-ordered probing must not lose to the blind shell on " +
        s"clustered data: $margPpm vs $shellPpm ppm")
    // comparable candidate mass: the win must come from probing BETTER
    // buckets, not simply an order of magnitude more of them
    assert(margCand <= shellCand * 2,
      s"margin probe mass within 2x of the shell: $margCand vs $shellCand")
  }
}
