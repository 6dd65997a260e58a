package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Per-partition streaming union-find → min-root STAR edges: the
  * connectivity-preserving edge reduction shared by the multi-probe
  * forest kernel ([[SimilarityQueries.mpForestEdges]], which rides the
  * probe join's partitions) and the generic min-label BSP
  * ([[DedupQueries]]'s component loop, which contracts whatever edge
  * list a consumer hands it).
  *
  * Exactness argument (the load-bearing fact, spec-pinned in
  * ClusteredFixtureSpec): partitioning an edge multiset arbitrarily and
  * replacing each part by any structure with the same within-part
  * connectivity preserves the components of the union — every path
  * decomposes into in-part edges, each replaceable by a walk through
  * that part's stars. Union by min id makes the surviving root the
  * component min, so emitted stars are (min, member) with min < member,
  * deterministic given the partition contents; FINAL components are
  * partition-invariant by the argument above.
  *
  * Cost shape: one sequential pass per partition, O(distinct vertices
  * in the partition) map entries, ≤ one emitted row per (partition,
  * vertex) — a dense duplicate cluster's O(|V|²) threshold-passing
  * edges leave as O(|V|) stars, and a star graph's diameter of 2 lets
  * the downstream min-label BSP converge in a handful of rounds.
  * mapPartitions (not an Expression/aggregate) is deliberate: a
  * streaming union-find is whole-operator logic no built-in expresses
  * without re-shuffling the pair mass — the documented last-resort
  * case. */
private[ext] object StarContraction {
  /** (a, b) edge pairs → (root, member) star rows, per partition. */
  def stars(edges: Dataset[(Long, Long)]): DataFrame = {
    val ss = edges.sparkSession
    import ss.implicits._
    edges.mapPartitions { it =>
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
      it.foreach { case (a, b) =>
        if (!parent.contains(a)) parent.update(a, a)
        if (!parent.contains(b)) parent.update(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.update(rb, ra)
        else if (rb < ra) parent.update(ra, rb)
      }
      // snapshot keys before emitting: find() path-compresses (value
      // writes) during the walk, and iterating a map being mutated —
      // even value-only — is a contract violation waiting to happen
      val ks = parent.keysIterator.toArray
      ks.iterator.flatMap { v =>
        val r = find(v)
        if (r != v) Iterator.single((r, v)) else Iterator.empty
      }
    }.toDF("_1", "_2")
  }
}
