package graft

import graft.ext.{DedupQueries, Multimodal, SimilarityQueries, TextQueries}
import org.scalatest.funsuite.AnyFunSuite

/** Extension-operator behavior tests over the sf0.001 fixtures. */
class ExtSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("LSH pairs are a high-recall, zero-false-positive subset of exact jaccard pairs") {
    val exactRows = DedupQueries.ngramJaccardPairs(spark, dir).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val highJ = exactRows.filter(_.getDouble(2) >= 0.7)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.lshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixtures should contain planted near-dups")
    // Post-verification kills false positives outright...
    assert(lsh.subsetOf(exact))
    // ...and 8x2 banding collides w.p. 1-(1-j^2)^8: ~0.995 at j=0.7,
    // ~0.90 right at the 0.5 threshold — near-perfect recall on true
    // dups, probabilistic on borderline pairs.
    assert(highJ.subsetOf(lsh), "every pair with jaccard >= 0.7 must be found")
    assert(lsh.size >= (exact.size * 0.85).toInt)
  }

  test("minhash signatures are deterministic and distinct for non-dup docs") {
    val sigs = DedupQueries.minhashSignature(spark, dir).collect().map(_.getString(1))
    assert(sigs.length == sigs.distinct.length || sigs.length - sigs.distinct.length < 60)
    val again = DedupQueries.minhashSignature(spark, dir).collect().map(_.getString(1))
    assert(sigs.toSeq == again.toSeq)
  }

  test("simhash of planted near-dup pairs has small hamming distance") {
    val pairs = DedupQueries.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sim = DedupQueries.simhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dists = pairs.map { case (a, b) =>
      java.lang.Long.bitCount(sim(a) ^ sim(b))
    }
    assert(dists.forall(_ <= 6), s"near-dup simhash hamming distances: ${dists.toSeq}")
  }

  test("ann top-k returns k descending-similarity neighbors") {
    val rows = SimilarityQueries.annTopK(spark, dir).collect()
    assert(rows.length == 10)
    val cosines = rows.map(_.getDouble(1)).toSeq
    assert(cosines == cosines.sorted.reverse)
    assert(cosines.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("quality scores stay in [0,1] and langid is deterministic") {
    val q = TextQueries.quality(spark, dir).collect()
    assert(q.forall(r => {
      val s = r.getAs[Double]("quality_score"); s >= 0.0 && s <= 1.0
    }))
    val l1 = TextQueries.langId(spark, dir).collect().map(_.getString(5)).toSeq
    val l2 = TextQueries.langId(spark, dir).collect().map(_.getString(5)).toSeq
    assert(l1 == l2)
  }

  test("multimodal stub decode derives dims from payload header bytes") {
    val meta = Multimodal.decodeStub(Multimodal.MediaRecord(7L, Array[Byte](65, 97, 0)))
    assert(meta == Multimodal.MediaMeta(7L, 65 % 64 + 1, 97 % 48 + 1, 3, 3L))
    val empty = Multimodal.decodeStub(Multimodal.MediaRecord(8L, Array.emptyByteArray))
    assert(empty.width == 1 && empty.height == 1 && empty.n_bytes == 0L)
  }
}
