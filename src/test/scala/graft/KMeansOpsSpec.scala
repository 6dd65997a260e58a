package graft

import graft.ops.KMeansOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BSP Lloyd loop behavior on the sf0.001 embeddings fixture. */
class KMeansOpsSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, dir, "embeddings")

  test("lloyd: strictly-decreasing integer inertia, total assignment, k clusters") {
    val n = emb.count()
    val (asgn, trace) = KMeansOps.lloyd(spark, emb, k = 10, maxIter = 8)
    val rows = asgn.collect()
    assert(rows.length == n, "every vector is assigned exactly once")
    val clusters = rows.map(_.getAs[Long]("cluster")).distinct
    assert(clusters.forall(c => c >= 1 && c <= 10))
    assert(clusters.length == 10,
      "empty clusters keep their previous centroid — k never shrinks")
    // Seeds are 10 arbitrary vectors, so at least one update round must
    // improve on them; strict decrease is the loop's acceptance rule.
    assert(trace.length >= 2, s"expected an improving round, trace=$trace")
    trace.sliding(2).foreach { case Seq(a, b) => assert(b.compareTo(a) < 0) }
    assert(trace.head.signum >= 0 && trace.last.signum >= 0)
  }

  test("lloyd is deterministic across runs") {
    val (a1, t1) = KMeansOps.lloyd(spark, emb, k = 5, maxIter = 4)
    val r1 = a1.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val (a2, t2) = KMeansOps.lloyd(spark, emb, k = 5, maxIter = 4)
    val r2 = a2.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(t1 == t2)
    assert(r1.sameElements(r2))
  }

  test("updateCentroids emits full-dimension integer-mean centroids") {
    val e = KMeansOps.microVectors(emb)
    val cents = e.filter(col("vec_id").between(1, 3))
      .select(col("vec_id").as("cent_id"), col("vm").as("cm"))
    val next = KMeansOps.updateCentroids(KMeansOps.assign(e, cents)).collect()
    assert(next.length == 3)
    next.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("cm").length == 64)
    }
  }

  test("updateCentroids keeps an empty cluster at its previous centroid") {
    import spark.implicits._
    // Two identical seed vectors: the (distance, lowest-cent_id) tie-break
    // sends both points to cluster 1, so cluster 2 captures nothing.
    val vecs = Seq((1L, Seq(0L, 0L)), (2L, Seq(0L, 0L)))
      .toDF("vec_id", "vm")
    val cents = Seq((1L, Seq(0L, 0L)), (2L, Seq(0L, 0L)))
      .toDF("cent_id", "cm")
    val asgn = KMeansOps.assign(vecs, cents)
    assert(asgn.collect().forall(_.getAs[Long]("cluster") == 1L))
    val next = KMeansOps.updateCentroids(asgn, Some(cents))
      .orderBy("cent_id").collect()
    assert(next.length == 2, "k is preserved through an empty-cluster round")
    assert(next(1).getAs[scala.collection.Seq[Long]]("cm") == Seq(0L, 0L))
  }
}
