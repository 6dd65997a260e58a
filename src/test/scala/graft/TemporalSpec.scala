package graft

import graft.queries.TemporalQueries
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the temporal operators: the as-of window construction
  * against a brute-force reference, and sessionization invariants. */
class TemporalSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("resample emits a dense hourly grid whose fill matches a brute-force lookup") {
    val rows = TemporalQueries.q48Resample(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("user_id") < 20)
      .select("user_id", "ts", "value", "event_id").collect()
      .groupBy(_.getLong(0))
    rows.groupBy(_.getLong(0)).foreach { case (uid, g) =>
      val ts = g.map(_.getTimestamp(1).getTime).sorted
      // dense hourly grid: consecutive points exactly 3600s apart
      assert(ts.zip(ts.tail).forall { case (a, b) => b - a == 3600000L },
        s"user $uid grid not dense")
      // every grid point's fill = brute-force last event at-or-before
      val evs = ev(uid).sortBy(r => (r.getTimestamp(1).getTime, r.getLong(3)))
      g.foreach { r =>
        val best = evs.filter(e => !e.getTimestamp(1).after(r.getTimestamp(1))).lastOption
        assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == best.map(_.getLong(3)),
          s"user $uid at ${r.getTimestamp(1)}")
        assert(Option(r.get(2)).map(_.asInstanceOf[Double]) == best.map(_.getDouble(2)))
      }
    }
  }

  test("as-of join matches a brute-force per-row scan") {
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
    val clicks = ev.filter(_.getString(2) == "click")
    val expected = ev.filter(_.getString(2) == "purchase").map { p =>
      val best = clicks
        .filter(c => c.getLong(1) == p.getLong(1) &&
          !c.getTimestamp(3).after(p.getTimestamp(3)))
        .sortBy(c => (us(c.getTimestamp(3)), c.getLong(0)))
        .lastOption.map(_.getLong(0))
      p.getLong(0) -> best
    }.toMap
    val got = TemporalQueries.q19Asof(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(got.keySet == expected.keySet)
    assert(got == expected)
  }

  test("as-of at-or-before includes same-instant clicks and breaks ts ties by max event_id") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0, 7L, "click", 0.0, ""),
      (2L, t0, 7L, "click", 0.0, ""),   // same instant, larger id wins
      (3L, t0, 7L, "purchase", 0.0, ""),
      (4L, new java.sql.Timestamp(t0.getTime + 1000), 7L, "purchase", 0.0, ""),
      (5L, new java.sql.Timestamp(t0.getTime + 2000), 8L, "purchase", 0.0, "")) // no click
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = ckptDir("asof")
    rows.write.mode("overwrite").parquet(s"$out/events.parquet")
    val got = TemporalQueries.q19Asof(spark, out).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(got == Map(3L -> Some(2L), 4L -> Some(2L), 5L -> None))
  }

  private def us(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000

  test("sessionization partitions each user's events exactly and respects the gap") {
    val sess = TemporalQueries.q21Sessionize(spark, dir).collect()
    val perUser = sess.groupBy(_.getLong(0))
    val events = Tables.load(spark, dir, "events").groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Every event lands in exactly one session.
    assert(perUser.view.mapValues(_.map(_.getLong(2)).sum).toMap == events)
    perUser.foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      // Session ids are 1..n dense.
      assert(sorted.map(_.getLong(1)).toSeq == (1L to ss.length).toSeq)
      // Consecutive sessions are separated by more than the gap.
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(us(b.getTimestamp(3)) - us(a.getTimestamp(4)) >
            TemporalQueries.SessionGapUs)
        case _ => ()
      }
      // Within a session, duration is consistent with the bounds.
      sorted.foreach { s =>
        assert(s.getLong(5) == us(s.getTimestamp(4)) - us(s.getTimestamp(3)))
      }
    }
  }

  test("event trigram counts match a brute-force per-user sequence walk") {
    val got = TemporalQueries.q62EventNgrams(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val seqs = Tables.load(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        .map(_.getString(3)).toSeq)
    val tri = seqs.toSeq.flatMap { case (uid, es) =>
      es.sliding(3).filter(_.length == 3).map(t => ((t(0), t(1), t(2)), uid))
    }
    val want = tri.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).distinct.size.toLong)).toMap
    assert(got.nonEmpty)
    got.foreach { case (k, v) => assert(want(k) == v, s"trigram $k") }
    // the returned set is exactly the global top-|got| by count
    val floor = got.values.map(_._1).min
    assert(want.values.count(_._1 > floor) <= got.size)
  }

  test("mad outliers: outlier share is small and deviations are median-consistent") {
    val rows = graft.queries.AdvancedQueries.q63MadOutliers(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val out = r.getAs[Long]("n_outliers")
      assert(out >= 0 && out < n / 4, "MAD flags a minority tail")
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Double]("max_adev") >= r.getAs[Double]("mad"))
    }
  }

  test("range join covers every event exactly once") {
    val n = TemporalQueries.q20RangeJoin(spark, dir).collect().map(_.getLong(2)).sum
    assert(n == Tables.load(spark, dir, "events").count())
  }

  test("cdc compaction keeps exactly the non-tombstone latest row per key") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "event_type", "value", "ts", "event_id").collect()
    val byUser = ev.groupBy(_.getLong(0))
    val expected = byUser.flatMap { case (uid, rows) =>
      val last = rows.maxBy(r => (us(r.getTimestamp(3)), r.getLong(4)))
      if (last.getString(1) == "error") None
      else Some(uid -> (last.getDouble(2), last.getLong(4), rows.length.toLong))
    }
    val got = TemporalQueries.q50CdcCompact(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("scd2 versions tile each user's timeline with no overlap and one open version") {
    val vers = TemporalQueries.q51Scd2(spark, dir).collect()
    val events = Tables.load(spark, dir, "events").groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUser = vers.groupBy(_.getLong(0))
    assert(perUser.view.mapValues(_.map(_.getLong(5)).sum).toMap == events)
    perUser.foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_.getLong(1))
      // dense version ids from 1; exactly one open (is_current) version — the last
      assert(sorted.map(_.getLong(1)).toSeq == (1L to vs.length).toSeq)
      assert(sorted.count(_.getBoolean(6)) == 1 && sorted.last.getBoolean(6))
      // valid_to chains to the next version's valid_from; closed otherwise
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3), s"user $uid chain break")
          // consecutive versions must actually change status
          assert(a.getString(2) != b.getString(2), s"user $uid uncompressed run")
        case _ => ()
      }
    }
  }

  test("peak concurrency is attained and never exceeds the interval count per type") {
    val peaks = TemporalQueries.q52PeakConcurrency(spark, dir).collect()
    val counts = Tables.load(spark, dir, "events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(peaks.map(_.getString(0)).toSet == counts.keySet)
    peaks.foreach { r =>
      val (tpe, peak, nAt) = (r.getString(0), r.getLong(1), r.getLong(3))
      assert(peak >= 1 && peak <= counts(tpe), s"$tpe peak out of range")
      assert(nAt >= 1)
      // brute-force check: count intervals open at the reported instant
      val at = r.getTimestamp(2).getTime
      val open = Tables.load(spark, dir, "events")
        .filter(org.apache.spark.sql.functions.col("event_type") === tpe)
        .collect().count { e =>
          val t0 = e.getTimestamp(1).getTime
          t0 <= at && at < t0 + 3600000L
        }
      assert(open.toLong == peak, s"$tpe concurrency at peak_at")
    }
  }

  test("merged intervals match a brute-force per-user sweep and never overlap") {
    val rows = TemporalQueries.q64MergeIntervals(spark, dir).collect()
    // Timestamps carry microseconds, so the sweep runs in micros (getTime
    // alone truncates to ms and the duration check misses the sub-ms part).
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val ev = Tables.load(spark, dir, "events").select("user_id", "ts").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1))))
    val lenUs = 3600000000L
    ev.groupBy(_._1).foreach { case (uid, g) =>
      // Brute-force sweep: sort starts, cut where start > running max end.
      val starts = g.map(_._2).sorted
      val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var (s0, e0, n0) = (starts.head, starts.head + lenUs, 1L)
      starts.tail.foreach { t =>
        if (t > e0) { islands += ((s0, e0, n0)); s0 = t; e0 = t + lenUs; n0 = 1 }
        else { e0 = math.max(e0, t + lenUs); n0 += 1 }
      }
      islands += ((s0, e0, n0))
      val got = rows.filter(_.getLong(0) == uid).sortBy(_.getLong(1))
      assert(got.length == islands.length, s"island count for user $uid")
      got.zip(islands).foreach { case (r, (s, e, n)) =>
        assert(r.getLong(2) == n)
        assert(us(r.getTimestamp(3)) == s)
        assert(us(r.getTimestamp(4)) == e)
        assert(r.getLong(5) == e - s)
      }
      // Islands are maximal: consecutive spans are separated by a true gap.
      got.sliding(2).foreach {
        case Array(a, b) => assert(us(b.getTimestamp(3)) > us(a.getTimestamp(4)))
        case _ => ()
      }
    }
  }

  test("cusum peak matches a sequential integer replay per user") {
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val rows = TemporalQueries.q66Cusum(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), (us(r.getTimestamp(1)), r.getLong(2),
        math.round(r.getDouble(3) * 1000000.0))))
      .groupBy(_._1)
    ev.foreach { case (uid, g) =>
      val vs = g.map(_._2).sortBy(t => (t._1, t._2)).map(_._3)
      val tm = vs.sum / vs.length // both engines floor non-negative sums
      var s = 0L; var peak = 0L
      vs.foreach { v => s = math.max(0L, s + (v - tm)); peak = math.max(peak, s) }
      val mad = vs.map(v => math.abs(v - tm)).sum / vs.length
      val r = rows(uid)
      assert(r.getLong(1) == vs.length && r.getLong(2) == tm)
      assert(r.getLong(3) == peak, s"user $uid peak")
      assert(r.getLong(4) == mad && r.getBoolean(5) == (peak > 4 * mad))
    }
  }

  test("kmv overlap sketches replay exactly from raw hashes and track exact jaccard") {
    val k = graft.queries.AdvancedQueries.KmvOverlapK
    def h48(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    }
    val du = Tables.load(spark, dir, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = du.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).toSet }
    val rows = graft.queries.AdvancedQueries.q65SketchOverlap(spark, dir).collect()
    assert(rows.length == byType.size * (byType.size - 1) / 2)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (sa, sb) = (byType(ta), byType(tb))
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      assert(r.getLong(4) == (sa intersect sb).size)
      // Replay the sketch algebra from scratch on raw hashes.
      val (ha, hb) = (sa.map(u => h48(u.toString)).toSeq.sorted.take(k),
        sb.map(u => h48(u.toString)).toSeq.sorted.take(k))
      val u = (ha ++ hb).distinct.sorted
      val denom = math.min(k, u.length)
      val bottom = u.take(denom).toSet
      val common = (ha.toSet intersect hb.toSet intersect bottom).size
      val jacEst = common.toDouble / denom
      assert(math.abs(r.getDouble(6) - jacEst) < 1e-6, s"($ta,$tb) jac_est")
      // The sketch estimate should be a usable stand-in for exact jaccard.
      assert(math.abs(r.getDouble(6) - r.getDouble(5)) < 0.35, s"($ta,$tb) error")
    }
  }

  test("mode picks each user's most frequent type with lexicographic tie-break") {
    val ev = Tables.load(spark, dir, "events").select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rows = graft.queries.OlapQueries.q67Mode(spark, dir).collect()
    assert(rows.length == ev.map(_._1).distinct.length)
    rows.foreach { r =>
      val g = ev.filter(_._1 == r.getLong(0)).map(_._2)
      val counts = g.groupBy(identity).map { case (t, xs) => (t, xs.length) }
      val best = counts.toSeq.minBy { case (t, c) => (-c, t) }
      assert(r.getString(1) == best._1 && r.getLong(2) == best._2.toLong)
      assert(r.getLong(3) == g.length.toLong)
    }
  }

  test("nearest-event join matches a brute-force bidirectional scan with tie rules") {
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._1)
    val rows = TemporalQueries.q68NearestEvent(spark, dir).collect()
    val purchases = ev.filter(_._4 == "purchase")
    assert(rows.length == purchases.length)
    val got = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    purchases.foreach { case (uid, pus, pid, _) =>
      val best = clicksByUser.getOrElse(uid, Array.empty).map { case (_, cus, ceid, _) =>
        val gap = math.abs(cus - pus)
        // order: gap, then earlier click, then backward:max-eid / forward:min-eid
        ((gap, cus, if (cus <= pus) -ceid else ceid), (ceid, gap))
      }.sortBy(_._1).headOption.map(_._2)
      assert(got(pid) == best, s"purchase $pid")
    }
  }

  test("bucketized interval join equals the brute-force overlap product") {
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val h = 3600000000L
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2), r.getString(3)))
    val expected = (for {
      (ua, sa, ca, ta) <- ev if ta == "click"
      (ub, sb, cb, tb) <- ev if tb == "error" && ub == ua
      if sa < sb + h && sb < sa + h
    } yield (ua, ca, cb, math.min(sa + h, sb + h) - math.max(sa, sb))).toSet
    val got = TemporalQueries.q69IntervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("ivf ann returns k results and never beats the exact top-1 by construction") {
    val ivf = graft.ext.SimilarityQueries.annIvf(spark, dir).collect()
    assert(ivf.length == 10)
    val exact = graft.ext.SimilarityQueries.annTopK(spark, dir).collect()
    // IVF cosines are a subset of the corpus, so its best cannot exceed
    // the exact best.
    assert(ivf.head.getDouble(2) <= exact.head.getDouble(1) + 1e-9)
    // Descending order.
    assert(ivf.map(_.getDouble(2)).toSeq == ivf.map(_.getDouble(2)).sortBy(-_).toSeq)
  }

  test("retention matrix matches a brute-force cohort replay") {
    def us(t: java.sql.Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val wk = 604800000000L
    val ev = Tables.load(spark, dir, "events").select("user_id", "ts").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)) / wk))
    val first = ev.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val cells = ev.map { case (u, w) => (first(u), w - first(u), u) }.distinct
      .groupBy(t => (t._1, t._2)).map { case (k, g) => k -> g.map(_._3).distinct.length }
    val rows = graft.queries.TemporalQueries.q70Retention(spark, dir).collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val (cw, off) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == cells((cw, off)), s"cell ($cw, $off)")
      assert(r.getLong(3) == cells((cw, 0L)))
      // offset 0 is the cohort definition itself: retention exactly 1.
      if (off == 0L) assert(r.getDouble(4) == 1.0)
      assert(r.getLong(2) <= r.getLong(3), "a cohort never grows")
    }
  }

  test("skyline survivors are exactly the non-dominated orders") {
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderdate").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100.0),
        // Tables.load normalizes NTZ to TIMESTAMP; session tz is UTC.
        r.getTimestamp(2).toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDate.toEpochDay))
    def dominated(a: (Long, Long, Long)) = o.exists(b => b._1 != a._1 &&
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    val expected = o.filterNot(dominated).map(_._1).sorted.toSeq
    val got = graft.queries.AdvancedQueries.q72Skyline(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("ab lift arms partition the joined users and rates replay exactly") {
    val conv = Tables.load(spark, dir, "events")
      .select("user_id", "event_type").collect()
      .groupBy(_.getLong(0))
      .map { case (u, g) => u -> (if (g.exists(_.getString(1) == "purchase")) 1L else 0L) }
    val seg = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byArm = conv.toSeq.flatMap { case (u, c) =>
      seg.get(u).map(s => (s, u % 2, c)) }
      .groupBy(t => (t._1, t._2)).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    graft.queries.AdvancedQueries.q73AbLift(spark, dir).collect().foreach { r =>
      val s = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) == byArm((s, 1L)))
      assert((r.getLong(3), r.getLong(4)) == byArm((s, 0L)))
      assert(r.getLong(5) == r.getLong(2) * 1000000L / r.getLong(1))
      assert(r.getLong(7) == r.getLong(5) - r.getLong(6))
    }
  }

  test("multi-touch attribution replays a brute-force next-purchase U-shape fold") {
    val LookaheadUs = 7L * 86400 * 1000000
    def us(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), us(r.getTimestamp(3))))
    val expected = ev.filter(_._3 != "purchase").flatMap { t =>
      ev.filter(p => p._1 == t._1 && p._3 == "purchase" && p._4 > t._4)
        .sortBy(p => (p._4, p._2)).headOption
        .filter(p => p._4 - t._4 <= LookaheadUs)
        .map(p => (t._1, p._2, t._2, t._3, t._4))
    }.groupBy(t => (t._1, t._2)).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(t => (t._5, t._3))
      val n = sorted.length
      sorted.zipWithIndex.map { case (t, i) =>
        val w =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        (t._4, w)
      }
    }.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val got = graft.queries.TemporalQueries.q77Multitouch(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("multi-touch attribution requires a STRICTLY later purchase at timestamp collisions") {
    // A touch tied with a purchase at the same microsecond, whose only
    // strictly-later purchase is beyond the 7-day lookahead: the oracle's
    // p.us > t.us rejects the tie AND the late purchase, so the touch must
    // drop entirely. The fixtures never collide on (user_id, ts), so only
    // this synthetic frame exercises the boundary.
    val tmp = ckptDir("q77tie")
    import spark.implicits._
    Seq(
      (1L, 1L, "view", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, 2L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, 3L, "purchase", java.sql.Timestamp.valueOf("2024-01-10 10:00:00")),
      // control: tie replaced by a strictly-later in-window purchase
      (2L, 4L, "click", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 5L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 10:00:01")))
      .toDF("user_id", "event_id", "event_type", "ts")
      .write.parquet(s"$tmp/events.parquet")
    val got = graft.queries.TemporalQueries.q77Multitouch(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("click" -> (1L, 1000000L)), got.toString)
  }

  test("decay score halves micro-units per whole week from the newest event") {
    val rows = Tables.load(spark, dir, "events")
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(round(value * 1000000.0D, 0) as bigint) as vm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val anchor = rows.map(_._2).max
    val expected = rows.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._3).sum,
        g.map(t => t._3 >> math.min((anchor - t._2) / 604800000000L, 62L).toInt).sum)
    }.toMap
    val got = graft.queries.AdvancedQueries.q78DecayScore(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // decay never increases value and must strictly shrink something old
    got.foreach { case (_, (_, raw, dec)) => assert(dec <= raw) }
    assert(got.values.map(_._2).sum > got.values.map(_._3).sum)
  }

  test("erasure cascade counts partition each table and respect the FK chain") {
    val cust = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
    val victims = cust.filter(r =>
      r.getString(1) == "AUTOMOBILE" && r.getDouble(2) < 0).map(_.getLong(0)).toSet
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey").collect()
    val delOrders = orders.filter(r => victims(r.getLong(1))).map(_.getLong(0)).toSet
    val lines = Tables.load(spark, dir, "lineitem").select("l_orderkey").collect()
    val got = graft.queries.AdvancedQueries.q79ErasureCascade(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("customer") == (victims.size.toLong, (cust.length - victims.size).toLong))
    assert(got("orders") == (delOrders.size.toLong, (orders.length - delOrders.size).toLong))
    val delLines = lines.count(r => delOrders(r.getLong(0))).toLong
    assert(got("lineitem") == (delLines, lines.length - delLines))
    assert(victims.nonEmpty && delOrders.nonEmpty, "fixture must exercise the cascade")
  }

  test("twap replays from a sequential interval walk and diverges from the plain mean") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDouble(3) * 1000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .groupBy(_._1)
    val got = graft.queries.TemporalQueries.q105Twap(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    var diverged = 0
    ev.foreach { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val ivs = sorted.sliding(2).collect {
        case Array(a, b) => (a._4, b._2 - a._2)
      }.toSeq
      if (ivs.isEmpty) assert(!got.contains(u))
      else {
        val span = ivs.map(_._2).sum
        val num = ivs.map { case (v, dt) => BigInt(v) * BigInt(dt) }.sum
        assert(got(u) == ((ivs.length.toLong, span, (num / span).toLong)), s"user $u")
        val mean = sorted.map(_._4).sum / sorted.length
        if ((got(u)._3 - mean).abs > mean / 20) diverged += 1
      }
    }
    // on irregular sampling TWAP must genuinely differ from the plain mean
    assert(diverged > 0, "TWAP never diverged from the naive mean — weight is dead")
  }

  test("snapshot reconstruction replays per-cut argmax and nests monotonically") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cuts = TemporalQueries.SnapshotCuts.map(c =>
      c -> java.time.Instant.parse(s"${c}T00:00:00Z").toEpochMilli * 1000L)
    val got = TemporalQueries.q104Snapshots(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    cuts.foreach { case (snap, cutUs) =>
      val expect = ev.filter(_._2 <= cutUs).groupBy(_._1)
        .map { case (u, es) => (snap, u) -> { val m = es.maxBy(e => (e._2, e._3)); (m._2, m._3) } }
      expect.foreach { case (k, v) => assert(got(k) == v, s"$k") }
      assert(got.count(_._1._1 == snap) == expect.size)
    }
    // later snapshots can only see MORE users, and a user's last_us is
    // non-decreasing across snapshots
    cuts.map(_._1).sliding(2).foreach { case Seq(a, b) =>
      val ua = got.keys.filter(_._1 == a).map(_._2).toSet
      val ub = got.keys.filter(_._1 == b).map(_._2).toSet
      assert(ua.subsetOf(ub))
      ua.foreach(u => assert(got((a, u))._1 <= got((b, u))._1))
    }
  }

  test("zone-map audit matches a brute-force zone recompute and never misses a hit") {
    val rows = TemporalQueries.q106ZoneMap(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 3)
    val ev = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "value", "event_type").collect()
    val mx = ev.map(_.getLong(0)).max
    val z = TemporalQueries.ZonesN
    val zoneOf = (id: Long) => id * z / (mx + 1)
    val cut = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    val preds: Map[String, org.apache.spark.sql.Row => Boolean] = Map(
      "p1_ts_late" -> (r => !r.getTimestamp(1).before(cut)),
      "p2_value_hi" -> (r => r.getDouble(2) >= 400.0),
      "p3_purchase" -> (r => r.getString(3) == "purchase"))
    val byZone = ev.groupBy(r => zoneOf(r.getLong(0)))
    preds.foreach { case (name, p) =>
      val r = rows(name)
      val hitsPerZone = byZone.view.mapValues(_.count(p)).toMap
      assert(r.getLong(1) == byZone.size.toLong, s"$name n_zones")
      assert(r.getLong(3) == hitsPerZone.count(_._2 > 0).toLong, s"$name zones_with_hits")
      assert(r.getLong(6) == hitsPerZone.values.sum.toLong, s"$name rows_matched")
      // soundness: scanning is a SUPERSET of matching — a zone map may
      // over-scan (false positives) but must never skip a zone with hits
      assert(r.getLong(2) >= r.getLong(3), s"$name scans fewer zones than have hits")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3), s"$name false_pos accounting")
      assert(r.getLong(5) >= r.getLong(6), s"$name scanned rows < matched rows")
    }
    // the correlated ts predicate must actually PRUNE on this fixture
    assert(rows("p1_ts_late").getLong(2) < rows("p1_ts_late").getLong(1))
  }

  test("layout what-if: clustering prunes to a near-minimal zone set, same matches") {
    val rows = TemporalQueries.q107LayoutWhatIf(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 2)
    val (a, b) = (rows("a_insertion"), rows("b_user_clustered"))
    // both layouts see the same corpus and the same true matches
    assert(a.getLong(1) == b.getLong(1))
    assert(a.getLong(4) == b.getLong(4) && a.getLong(4) > 0)
    // clustering strictly reduces scanned zones and rows on this fixture
    assert(b.getLong(2) < a.getLong(2))
    assert(b.getLong(3) < a.getLong(3))
    // the clustered layout packs one user into at most ceil(hits/zone)+1
    // zones: hits span contiguous ranks, so zones touched <= 2 + hits*Z/n
    val n = Tables.load(spark, dir, "events").count()
    val maxZones = 2 + a.getLong(4) * TemporalQueries.ZonesN / n
    assert(b.getLong(2) <= maxZones, s"clustered zones ${b.getLong(2)} > $maxZones")
    // scanning never undercounts: rows_scanned >= rows_matched
    Seq(a, b).foreach(r => assert(r.getLong(3) >= r.getLong(4)))
  }

  test("growth accounting classifies new/retained/resurrected/churned on built timelines") {
    import spark.implicits._
    // u1: 1,2,3 (new, retained x2); u2: 1,3 (new, resurrected; churn into 2)
    // u3: 2 (new; churn into 3); u4: 1 (new; churn into 2)
    val act = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L),
      (3L, 2L), (4L, 1L)).toDF("user_id", "week")
    val got = TemporalQueries.q109GrowthAccountingOf(act).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) == ((3L, 3L, 0L, 0L, 0L)))
    assert(got(2L) == ((2L, 1L, 1L, 0L, 2L))) // u3 new, u1 retained; u2+u4 churned in
    assert(got(3L) == ((2L, 0L, 1L, 1L, 1L))) // u1 retained, u2 resurrected; u3 churned
    // identities: actives = new + retained + resurrected per week;
    // churned(w) = actives(w-1) - retained(w)
    got.foreach { case (_, (a, n, r, res, _)) => assert(a == n + r + res) }
    Seq(2L, 3L).foreach { w =>
      assert(got(w)._5 == got(w - 1)._1 - got(w)._3)
    }
    // the fixture corpus: every user active every week -> no churn at all
    val fix = TemporalQueries.q109GrowthAccounting(spark, dir).collect()
    assert(fix.map(_.getLong(5)).sum == 0L)
    assert(fix.map(_.getLong(4)).sum == 0L)
    // empty activity yields an empty ledger, not an NPE
    val empty = TemporalQueries.q109GrowthAccountingOf(
      Seq.empty[(Long, Long)].toDF("user_id", "week"))
    assert(empty.collect().isEmpty)
    // a globally idle week still reports its churn row (the full-outer
    // ledger): both users skip week 2 entirely, so week 2 has zero
    // actives but two churners — a left join FROM statuses would drop it
    val idle = TemporalQueries.q109GrowthAccountingOf(
      Seq((1L, 1L), (1L, 3L), (2L, 1L), (2L, 3L)).toDF("user_id", "week"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(idle(2L) == ((0L, 0L, 0L, 0L, 2L)))
    assert(idle(3L) == ((2L, 0L, 0L, 2L, 0L)))
    // and the identity holds THROUGH the idle week
    assert(idle(2L)._5 == idle(1L)._1 - idle(2L)._3)
  }

  test("mutual information is near-non-negative and replays from the contingency") {
    val rows = graft.queries.TemporalQueries.q121MutualInfo(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("f_dow", "f_vbucket"))
    rows.foreach { case (f, (cells, mi)) =>
      assert(cells > 0)
      // MI >= 0 exactly; per-cell nano rounding can dip the sum a hair
      assert(mi >= -cells, s"$f mi $mi below rounding floor")
      // and it is bounded by ln(min(|X|,|Y|)) nats = ln(5) for 5 types
      assert(mi <= math.round(math.log(5.0) * 1e9), s"$f mi $mi above H(Y)")
    }
    // exact replay from a driver-side contingency for the dow feature
    val e = Tables.load(spark, dir, "events")
      .selectExpr("event_type y", "(unix_micros(ts) div 86400000000) % 7 x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = e.length.toLong
    val nxy = e.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ny = e.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nx = e.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val s = nxy.map { case ((y, x), c) =>
      BigDecimal(c * math.log(c.toDouble * n / (nx(x).toDouble * ny(y).toDouble)) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    assert(rows("f_dow")._2 == s / n, s"replay ${s / n} vs ${rows("f_dow")._2}")
  }

  test("window funnel maximizes over anchors and is monotone in depth") {
    import spark.implicits._
    val rows = graft.queries.TemporalQueries.q120WindowFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.head._2._2 == 1000000L, "depth-1 conversion is 100% by definition")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2._1 >= b._2._1, "reaching a deeper step can only lose users")
    }
    // anchor maximization: the FIRST signup's window (7 d) misses every
    // later step; only the SECOND signup completes the chain. A greedy
    // first-anchor implementation reports depth 1 — the max over anchors
    // must report 4.
    val d = 86400000000L
    val act = Seq(
      (1L, 1, 0L),            // signup (stale anchor)
      (1L, 1, 9L * d),        // signup (live anchor)
      (1L, 2, 9L * d + 1000L),
      (1L, 3, 9L * d + 2000L),
      (1L, 4, 9L * d + 3000L),
      // user 2: all four steps but out of order -> depth stops at 2
      (2L, 1, 0L), (2L, 3, 1000L), (2L, 4, 2000L), (2L, 2, 3000L)
    ).toDF("user_id", "step", "us")
    val built = graft.queries.TemporalQueries.q120WindowFunnelOf(act).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(built(1L) == 2L, "both users enter the funnel")
    // user 2's earliest qualifying view is at 3000 (after the click), so
    // the chain stops at depth 2
    assert(built(2L) == 2L)
    assert(built(3L) == 1L && built(4L) == 1L, "only the re-anchored user converts")
    // strict ordering: equal timestamps must NOT chain
    val tied = Seq((9L, 1, 0L), (9L, 2, 0L)).toDF("user_id", "step", "us")
    val t2 = graft.queries.TemporalQueries.q120WindowFunnelOf(tied).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t2(1L) == 1L && t2(2L) == 0L)
  }

  test("bitemporal grid is monotone on both axes and T-lag hides late arrivals") {
    val rows = graft.queries.TemporalQueries.q119Bitemporal(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 4)
    // widening either cutoff can only ADD users
    assert(rows((50L, 50L))._1 <= rows((100L, 50L))._1)
    assert(rows((50L, 50L))._1 <= rows((50L, 100L))._1)
    assert(rows((100L, 50L))._1 <= rows((100L, 100L))._1)
    // at (T100, V100) the state still misses events whose ingest delay
    // pushed tx past the valid-time horizon — compare against the
    // no-transaction-axis reconstruction
    val full = Tables.load(spark, dir, "events").count()
    assert(rows((100L, 100L))._1 > 0)
    val lateTx = Tables.load(spark, dir, "events")
      .selectExpr("unix_micros(ts) us", "event_id")
      .selectExpr(s"us + ((event_id % 3600) * 2654435761 % 3600) * 1000000 tx_us", "us")
      .crossJoin(Tables.load(spark, dir, "events")
        .selectExpr("max(unix_micros(ts)) hi"))
      .filter(org.apache.spark.sql.functions.expr("tx_us > hi")).count()
    assert(lateTx > 0, "fixture must exercise the late-ingest branch")
    assert(full > 0)
  }

  test("attribution credit conserves exactly 1e6 per touched purchase under all three models") {
    val rows = graft.queries.TemporalQueries.q118Attribution(spark, dir).collect()
    assert(rows.nonEmpty)
    // purchases with at least one in-window touch, computed independently
    val e = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) us")
    e.createOrReplaceTempView("attr_e")
    val touched = spark.sql(
      s"""SELECT count(DISTINCT p.event_id) n FROM attr_e p
         |WHERE p.event_type = 'purchase' AND EXISTS (
         |  SELECT 1 FROM attr_e t WHERE t.user_id = p.user_id
         |   AND t.event_type <> 'purchase'
         |   AND t.us < p.us
         |   AND t.us >= p.us - ${graft.queries.TemporalQueries.AttribWindowUs})
         |""".stripMargin).head().getLong(0)
    // each model hands out exactly 1e6 micro-credits per touched purchase
    Seq(3, 4, 5).foreach { c =>
      assert(rows.map(_.getLong(c)).sum == touched * 1000000L,
        s"credit column $c must conserve")
    }
    // first- and last-touch are one-hot: their totals split over types,
    // and no type can carry more credit than 1e6 x its touched purchases
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) * 1000000L)
      assert(r.getLong(4) <= r.getLong(2) * 1000000L)
    }
  }

  test("point-in-time join attaches exactly one leak-free version per probe") {
    val rows = TemporalQueries.q111PitJoin(spark, dir).collect()
    val probes = Tables.load(spark, dir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    // exactly one version per probe — no fan-out, no drop
    assert(rows.length.toLong == probes)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    val versions = TemporalQueries.q51Scd2(spark, dir).collect()
      .groupBy(_.getLong(0))
    rows.foreach { r =>
      val (uid, pUs, version) = (r.getLong(0), r.getLong(2), r.getLong(3))
      def micros(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      val vs = versions(uid).map { v =>
        (v.getLong(1), micros(v.getTimestamp(3)),
          Option(v.getTimestamp(4)).map(micros))
      }
      // brute force: the version whose half-open interval contains p_us
      val expect = vs.filter { case (_, vf, vt) =>
        vf <= pUs && vt.forall(pUs < _)
      }
      assert(expect.length == 1, s"user $uid at $pUs")
      assert(version == expect.head._1)
      // leak-free: the matched version began at or before the probe
      assert(expect.head._2 <= pUs)
    }
  }

  test("psi bins tile both weeks and terms match a driver-side recompute") {
    val rows = TemporalQueries.q117Psi(spark, dir).collect().sortBy(_.getLong(0))
    assert(rows.length == TemporalQueries.PsiBins)
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("cast(round(value * 100.0D, 0) as bigint) vc",
        "unix_micros(ts) div 604800000000 wk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (vmin, vmax) = (ev.map(_._1).min, ev.map(_._1).max)
    val (w0, w1) = (ev.map(_._2).min, ev.map(_._2).max)
    val k = TemporalQueries.PsiBins
    def bin(v: Long) = math.min(k - 1, (v - vmin) * k / (vmax - vmin + 1)).toInt
    val base = ev.filter(_._2 == w0).map(e => bin(e._1))
    val cur = ev.filter(_._2 == w1).map(e => bin(e._1))
    assert(rows.map(_.getLong(1)).sum == base.length.toLong)
    assert(rows.map(_.getLong(2)).sum == cur.length.toLong)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      val (cb, cc) = (base.count(_ == b).toLong, cur.count(_ == b).toLong)
      assert(r.getLong(1) == cb && r.getLong(2) == cc, s"bin $b counts")
      val (nb, nc) = (base.length.toLong + k, cur.length.toLong + k)
      val term = ((cc + 1).toDouble / nc - (cb + 1).toDouble / nb) *
        math.log((cc + 1).toDouble * nb / (cb + 1) / nc) * 1e9
      assert(math.abs(r.getLong(3) - term) <= 1.0, s"bin $b term")
    }
    // PSI terms are individually non-negative ((q-p) and ln(q/p) share sign)
    rows.foreach(r => assert(r.getLong(3) >= 0L))
  }

  test("itemset pairs match a brute-force basket walk with exact support and lift") {
    val rows = TemporalQueries.q115Itemsets(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 as day", "event_type")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
    val baskets = ev.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap
    val n = BigInt(baskets.size)
    val cnt = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCnt = baskets.values.flatMap { b =>
      val s = b.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.length == pairCnt.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == pairCnt(k), s"$k cnt_ab")
      assert(r.getLong(3) == cnt(k._1) && r.getLong(4) == cnt(k._2))
      assert(r.getLong(5) == (BigInt(pairCnt(k)) * 1000000 / n).toLong)
      assert(r.getLong(6) == (BigInt(pairCnt(k)) * n * 1000000 /
        (BigInt(cnt(k._1)) * cnt(k._2))).toLong)
    }
  }

  test("equi-depth stats: exact NTILE populations, ordered non-overlapping ranges") {
    val rows = TemporalQueries.q113EquidepthStats(spark, dir).collect().sortBy(_.getLong(0))
    val n = Tables.load(spark, dir, "events").count()
    val k = TemporalQueries.StatsBins
    assert(rows.length == k)
    assert(rows.map(_.getLong(1)).sum == n)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == n / k + (if (i < n % k) 1 else 0), s"bin ${i + 1} depth")
      assert(r.getLong(2) <= r.getLong(3))
    }
    // boundaries ascend: bin i's max <= bin i+1's min (ties allowed at
    // the boundary value since rank, not value, cuts the bins)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getLong(3) <= b.getLong(2) ||
        (a.getLong(3) == b.getLong(2)), s"bins ${a.getLong(0)}/${b.getLong(0)} overlap")
      assert(a.getLong(2) <= b.getLong(2))
    }
  }

  test("table manifest checksums are partition-order invariant and row-sensitive") {
    val rows = graft.queries.AdvancedQueries.q116TableManifest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 10)
    // counts match the tables
    Seq("events", "documents", "embeddings").foreach { t =>
      assert(rows(t)._1 == Tables.load(spark, dir, t).count(), t)
    }
    // checksum replay: driver-side md5 over doc ids equals the engine's
    val docsum = Tables.load(spark, dir, "documents").select("doc_id").collect()
      .map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))
        java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
      }.sum
    assert(rows("documents")._2 == docsum)
    // sensitivity: RECOMPUTE the manifest checksum over documents minus
    // one row (driver-side, same per-row hash) and check it against the
    // reported key_checksum — removing a row must move the checksum
    val docsumMinus0 = Tables.load(spark, dir, "documents")
      .select("doc_id").collect()
      .filter(_.getLong(0) != 0L)
      .map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(r.getLong(0).toString.getBytes("UTF-8"))
        java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
      }.sum
    assert(docsumMinus0 != rows("documents")._2,
      "dropping doc 0 must change the reported documents checksum")
  }

  test("fk audit reports zero orphans on the consistent fixture star schema") {
    val rows = graft.queries.AdvancedQueries.q114FkAudit(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L, r.getString(0))
      assert(r.getLong(1) > 0L)
    }
    // and the audit actually detects a planted orphan
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 99L)).toDF("ck", "fk")
    val parent = Seq(10L).toDF("pk")
    val orphans = child.join(parent,
      org.apache.spark.sql.functions.col("fk") === org.apache.spark.sql.functions.col("pk"),
      "left_anti").count()
    assert(orphans == 1L)
  }

  test("dlq replay reconciles: clean + repaired equals the direct parse exactly") {
    val rows = TemporalQueries.q112DlqReplay(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 3)
    val (clean, rep, direct) =
      (rows("a_clean"), rows("b_repaired"), rows("c_all_direct"))
    assert(clean._1 + rep._1 == direct._1, "row counts reconcile")
    assert(clean._2 + rep._2 == direct._2, "value masses reconcile")
    // the repaired route carries exactly the 1-in-17 mangled population
    val n = Tables.load(spark, dir, "events").count()
    assert(rep._1 == (0L until n).count(_ % 17 == 0).toLong)
  }

  test("json quarantine routes exactly the mangled rows and preserves payloads") {
    val rows = TemporalQueries.q110JsonQuarantine(spark, dir).collect()
    val props = Tables.load(spark, dir, "events")
      .select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == props.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 17 == 0) {
        assert(r.getString(1) == "quarantined", s"event $id")
        assert(r.isNullAt(2))
        // the original (mangled) payload is preserved verbatim for replay
        assert(r.getString(3) == props(id).dropRight(1))
      } else {
        assert(r.getString(1) == "clean", s"event $id")
        val k = """"k":\s*(\d+)""".r.findFirstMatchIn(props(id)).get.group(1).toInt
        assert(r.getInt(2) == k)
        assert(r.isNullAt(3))
      }
    }
  }

  test("k-anonymity audit matches a brute-force group recompute and tiles the table") {
    val rows = TemporalQueries.q108KAnonymity(spark, dir).collect()
    val cust = Tables.load(spark, dir, "customer")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getDouble(2)))
    val groups = cust.groupBy(c => (c._1, c._2))
    assert(rows.length == groups.size)
    assert(rows.map(_.getLong(2)).sum == cust.length.toLong)
    rows.foreach { r =>
      val g = groups((r.getLong(0), r.getString(1)))
      assert(r.getLong(2) == g.length.toLong)
      val buckets = g.map(c => math.round(c._3 * 100.0) / 100000L).distinct
      assert(r.getLong(3) == buckets.length.toLong,
        s"group ${(r.getLong(0), r.getString(1))} l_distinct")
      assert(r.getInt(4) == (if (g.length < TemporalQueries.KAnonK) 1 else 0))
      assert(r.getInt(5) == (if (buckets.length < TemporalQueries.LDivL) 1 else 0))
    }
  }
}
