package graft

import graft.ops.StediOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (SURVEY §5.3): ScalaCheck generators produce the
  * corpus, one Spark job per property verifies it over every sample. */
class PropertySpec extends AnyFunSuite with SparkSuite {

  test("oracle-facing results are invariant to the shuffle partition count") {
    // The determinism contract behind every oracle hash (and behind
    // re-running a failed stage at 100 TB): identical rows whether the
    // plan shuffles into 32 partitions or 3. Exercises the queries whose
    // arithmetic COULD leak accumulation order if the integer-math
    // discipline slipped: the EWMA fold, CDC max_by, the RankOps sweep,
    // the linear probe's confusion grid, the correlation moments.
    val dir = "/root/testdata/sf0.001"
    val names = Seq("q49_ewma", "q50_cdc_compact", "q52_peak_concurrency",
      "s12_linear_probe", "q45_series_corr", "p2_token_packing",
      "q55_exact_median", "q56_salted_join", "q57_bloom_join",
      "q58_sharded_distinct", "q59_rollup_maintenance", "s13_mips",
      "s6_label_centroids")
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val base = names.map(n => n -> run(n)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      names.foreach { n =>
        assert(run(n) == base(n), s"$n not partitioning-invariant")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.sample.getOrElse(sys.error("generator exhausted"))

  test("power-iteration RDD round equals the per-row BigInteger reference") {
    // powerRoundExact (r16) accumulates the 64 re-projection sums as
    // per-partition hi/mid/lo longs split at 2^21 — this pins the
    // split+reconstruct against a naive exact reference on shapes the
    // fixture never produces: negative components (negative p exercises
    // the truncating div/% identity), magnitudes at the |xm| ≤ 1e6
    // envelope, several partitions, and a renormalized (negative,
    // non-uniform) direction vector.
    import java.math.BigInteger
    val dim = graft.ext.SimilarityQueries.PowerDim
    val rnd = new scala.util.Random(20260819L)
    val rows: Seq[Array[Long]] = Seq.fill(97)(
      Array.fill(dim)((rnd.nextInt(2000001) - 1000000).toLong))
    val v: IndexedSeq[BigInteger] = IndexedSeq.fill(dim)(
      BigInteger.valueOf((rnd.nextInt(2000001) - 1000000).toLong))
    val df = rows.map(r => Tuple1(r)).toDF("xm").repartition(5)
    val rdd = org.apache.spark.sql.GraftInternalRowShim.toInternalRdd(df)
    val got = graft.ext.SimilarityQueries.powerRoundExact(rdd, v)
    // reference: per-row exact d and per-dimension BigInteger sums
    val exp = (0 until dim).map { k =>
      rows.foldLeft(BigInteger.ZERO) { (acc, x) =>
        val dotv = (0 until dim).map(i => x(i) * v(i).longValueExact()).sum
        val d = dotv / 1000000L
        acc.add(BigInteger.valueOf(d * x(k)))
      }
    }
    assert(got == exp)
  }

  test("sketch-bracketed exact median equals the sequential median") {
    // Guards MedianOps' rank arithmetic (k1/k2, the c_lo offset, the
    // band bounds) on shapes the fixture never produces: heavy
    // duplication, two-point distributions, tiny n, odd/even n.
    val gens: Seq[Gen[List[Double]]] = Seq(
      Gen.listOfN(1, Gen.choose(-100.0, 100.0)),
      Gen.listOfN(2, Gen.choose(-100.0, 100.0)),
      Gen.listOfN(501, Gen.choose(-5.0, 5.0)),
      Gen.listOfN(500, Gen.oneOf(1.0, 2.0)),          // two-point mass
      Gen.listOfN(400, Gen.const(7.5)),               // single value
      Gen.listOfN(333, Gen.choose(0, 5).map(_.toDouble))) // heavy dupes
    gens.foreach { g =>
      val xs = sample(g)
      val df = xs.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
      val row = graft.ops.MedianOps.exactMedian(df, col("v"), col("id")).collect()(0)
      val sorted = xs.sorted
      val exp = (sorted((xs.size - 1) / 2) + sorted(xs.size / 2)) / 2.0
      assert(row.getLong(0) == xs.size.toLong)
      assert(math.abs(row.getDouble(1) - BigDecimal(exp)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-9,
        s"n=${xs.size}: got ${row.getDouble(1)}, want $exp")
    }
    // Degenerate: empty frame yields (0, NULL), not an NPE.
    val empty = graft.ops.MedianOps.exactMedian(
      Seq.empty[(Double, Long)].toDF("v", "id"), col("v"), col("id")).collect()(0)
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  test("base64 encode -> unbase64 decode is the identity for arbitrary unicode strings") {
    val strs = sample(Gen.listOfN(200, Gen.frequency(
      5 -> Gen.alphaNumStr,
      3 -> Gen.asciiPrintableStr,
      2 -> Gen.listOfN(20, Gen.oneOf("å", "ß", "中", "🙂", "\t", "\"", "\\")).map(_.mkString))))
      .filter(_.nonEmpty)
    val df = strs.toDF("s")
      .withColumn("rt", unbase64(base64(col("s").cast("binary"))).cast("string"))
    assert(df.filter(col("rt") =!= col("s")).count() == 0)
  }

  test("birthYear is always the first '-'-separated token of birthDay") {
    val days = sample(Gen.listOfN(200, for {
      y <- Gen.chooseNum(1900, 2099)
      m <- Gen.chooseNum(1, 12)
      d <- Gen.chooseNum(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"))
    // put birthDay in the email slot too, so the output carries its own input
    val got = StediOps.emailAndBirthYear(
      days.map(d => (d, d)).toDF("email", "birthDay")).collect()
    assert(got.forall(r => r.getString(1) == r.getString(0).take(4)))
  }

  test("join cardinality equals the sum over emails of |risk| * |customers|") {
    val emails = (0 until 20).map(i => s"u$i@test.com")
    val riskRows = sample(Gen.listOfN(300, for {
      e <- Gen.oneOf(emails)
      s <- Gen.chooseNum(-10.0, 40.0)
    } yield (e, s, "2020-09-14T07:54:06.417Z")))
    val custRows = sample(Gen.listOfN(60, for {
      e <- Gen.oneOf(emails)
      y <- Gen.chooseNum(1940, 2005)
    } yield (e, y.toString)))
    val risk = riskRows.toDF("customer", "score", "riskDate")
    val cust = custRows.toDF("email", "birthYear")
    val got = StediOps.joinRiskWithCustomer(risk, cust).count()
    val riskCounts = riskRows.groupBy(_._1).view.mapValues(_.size).toMap
    val custCounts = custRows.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = emails.map(e =>
      riskCounts.getOrElse(e, 0).toLong * custCounts.getOrElse(e, 0)).sum
    assert(got == expected)
  }

  test("as-of result is insensitive to other users' events") {
    // Property: adding arbitrary events for OTHER users never changes a
    // user's as-of matches (the window partitioning isolates keys).
    val mk = for {
      u <- Gen.chooseNum(1L, 3L)
      t <- Gen.chooseNum(0L, 100L)
      typ <- Gen.oneOf("click", "purchase", "view")
    } yield (u, t, typ)
    val base = sample(Gen.listOfN(120, mk)).zipWithIndex
      .map { case ((u, t, typ), i) => (i.toLong, new java.sql.Timestamp(t * 1000), u, typ, 0.0, "") }
    val noise = sample(Gen.listOfN(80, Gen.chooseNum(0L, 100L)))
      .zipWithIndex.map { case (t, i) =>
        (1000L + i, new java.sql.Timestamp(t * 1000), 99L, "click", 0.0, "")
      }
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val d1 = java.nio.file.Files.createTempDirectory("asof1").toString
    val d2 = java.nio.file.Files.createTempDirectory("asof2").toString
    base.toDF(cols: _*).write.mode("overwrite").parquet(s"$d1/events.parquet")
    (base ++ noise).toDF(cols: _*).write.mode("overwrite").parquet(s"$d2/events.parquet")
    def res(d: String) = graft.queries.TemporalQueries.q19Asof(spark, d)
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    assert(res(d2).view.filterKeys(_ < 1000).toMap == res(d1))
  }

  test("sharded distinct count is exact for any shard count") {
    val rows = sample(Gen.listOfN(400, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0L, 50L)
    } yield (k, v)))
    val df = rows.toDF("k", "v")
    val direct = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    for (shards <- Seq(1, 3, 16)) {
      val got = graft.ops.SkewOps.shardedCountDistinct(df, "k", "v", shards)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == direct, s"shards=$shards")
    }
  }

  test("minhash signature equality implies identical shingle sets is falsifiable but near-dup docs collide on bands") {
    // deterministic smoke over generated near-duplicates: a doc and a copy
    // with one word changed must share >= 1 LSH band (jaccard >> threshold)
    val words = Gen.oneOf("the", "fast", "spark", "row", "scan", "batch", "merge", "sort")
    val base = sample(Gen.listOfN(40, words)).mkString(" ")
    val mutated = base.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 20) "changed" else w }.mkString(" ")
    val df = Seq((0L, base), (1L, mutated)).toDF("doc_id", "text")
    val toks = split(lower(col("text")), " ")
    val sh = expr("array_distinct(transform(sequence(0, size(toks)-3), " +
      "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")
    val sets = df.withColumn("toks", toks).withColumn("sh", sh)
      .select(col("doc_id"), col("sh")).collect()
    val a = sets(0).getSeq[String](1).toSet
    val b = sets(1).getSeq[String](1).toSet
    val jac = a.intersect(b).size.toDouble / a.union(b).size
    assert(jac > 0.5, s"mutated doc should stay a near-dup (jaccard=$jac)")
  }

  test("distributed prefix sum equals the sequential exclusive scan for arbitrary inputs") {
    val weights = sample(Gen.listOfN(300, Gen.chooseNum(0L, 1000L)))
    val rows = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val nPart = Gen.chooseNum(1, 40).sample.getOrElse(8)
    val got = graft.ops.RankOps
      .withGlobalPrefixSum(rows.toDF("id", "w"), nPart, "ps", col("w"), col("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("ps")).toMap
    var acc = 0L
    val want = rows.map { case (id, w) => val p = id -> acc; acc += w; p }.toMap
    assert(got == want, s"nPart=$nPart")
  }

  test("distributed prefix max equals the sequential exclusive max-scan") {
    val values = sample(Gen.listOfN(300, Gen.chooseNum(-1000L, 1000L)))
    val rows = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val nPart = Gen.chooseNum(1, 40).sample.getOrElse(8)
    val got = graft.ops.RankOps
      .withGlobalPrefixMax(rows.toDF("id", "v"), nPart, "pm", col("v"), col("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pm")).toMap
    var acc = Long.MinValue
    val want = rows.map { case (id, v) =>
      val p = id -> acc; acc = math.max(acc, v); p
    }.toMap
    assert(got == want, s"nPart=$nPart")
  }

  test("multi-rule bpe fold equals the sequential single-pass merge on random inputs") {
    // Random symbol arrays over a tiny alphabet + random symbol-disjoint
    // rule sets (the batched trainer's selection invariant): the Spark
    // fold column and a driver-side single-pass merge must agree on
    // every sample — including self-pairs ((x,x) runs) and rules whose
    // concatenated output collides with another rule's symbol.
    def mergeMulti(syms: List[String], rules: Set[(String, String)]): List[String] = {
      val out = List.newBuilder[String]
      var i = 0
      val a = syms.toArray
      while (i < a.length) {
        if (i + 1 < a.length && rules((a(i), a(i + 1)))) {
          out += (a(i) + a(i + 1)); i += 2
        } else { out += a(i); i += 1 }
      }
      out.result()
    }
    val alphabet = List("a", "b", "c", "ab", "bc", "abc")
    val genCase = for {
      syms <- Gen.listOfN(12, Gen.oneOf(alphabet))
      // draw candidate rules, then enforce symbol-disjointness greedily
      raw <- Gen.listOfN(5, for {
        l <- Gen.oneOf(alphabet); r <- Gen.oneOf(alphabet)
      } yield (l, r))
    } yield {
      val used = scala.collection.mutable.Set.empty[String]
      val rules = raw.filter { case (l, r) =>
        if (used(l) || used(r)) false else { used += l; used += r; true }
      }
      (syms, if (rules.isEmpty) List(("a", "b")) else rules)
    }
    val cases = sample(Gen.listOfN(40, genCase))
    val df = cases.zipWithIndex
      .map { case ((syms, _), i) => (i.toLong, syms) }.toDF("id", "syms")
    cases.zipWithIndex.foreach { case ((syms, rules), i) =>
      val got = df.filter(col("id") === i.toLong)
        .select(graft.ext.TextQueries.bpeMergedSetCol(rules).as("m"))
        .collect().head.getSeq[String](0).toList
      assert(got == mergeMulti(syms, rules.toSet),
        s"case $i: syms=$syms rules=$rules got=$got")
    }
  }

  test("serpentine shard deal: doc counts within one across shards on any multiset") {
    // p25's dealing arithmetic (rank -> serpentine shard) must hand each
    // shard floor/ceil(n/S) items for ANY n — pure integer property of
    // the expression p25 plans, evaluated through the same SQL.
    val S = graft.ext.PipelineQueries.BalanceShards
    Seq(1, 7, 15, 16, 17, 31, 33, 160, 161).foreach { n =>
      val shards = (0 until n).map(_.toLong).toDF("g_rank")
        .withColumn("shard", expr(
          s"CAST(CASE WHEN (g_rank div $S) % 2 = 0 THEN g_rank % $S " +
            s"ELSE $S - 1 - (g_rank % $S) END AS BIGINT)"))
        .collect().map(_.getLong(1))
      val counts = shards.groupBy(identity).map(_._2.length)
      assert(counts.max - counts.min <= 1, s"n=$n")
      assert(shards.forall(s => s >= 0 && s < S), s"n=$n range")
    }
  }

  test("z-interleave is a bijection on the 8-bit x 8-bit grid") {
    // Distinct (x, y) pairs must map to distinct z (the curve visits every
    // cell exactly once); evaluated through the same SQL expression p6
    // plans, so the property covers what actually runs.
    val pairs = sample(Gen.listOfN(300, for {
      x <- Gen.chooseNum(0L, 255L)
      y <- Gen.chooseNum(0L, 255L)
    } yield (x, y))).distinct
    val zs = pairs.toDF("ux", "dyn")
      .withColumn("z", expr(graft.ext.PipelineQueries.zInterleaveExpr("ux", "dyn")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(zs.values.toSeq.distinct.size == pairs.size, "z collision")
    // Range check: 16 bits.
    assert(zs.values.forall(z => z >= 0 && z < 65536))
    // De-interleave recovers both coordinates exactly (x holds the odd
    // bit positions, y the even ones).
    pairs.foreach { case (x, y) =>
      val z = zs((x, y))
      val xBack = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      val yBack = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      assert(xBack == x && yBack == y, s"de-interleave mismatch at ($x,$y): $z")
    }
  }
}
