package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** DirCaches registry semantics (in package graft.ext so the class keeps
  * its private[ext] production visibility). */
class DirCachesSpec extends AnyFunSuite with graft.SparkSuite {

  test("a dir switch evicts the old dir, same dir is a hit, clear empties") {
    val c = new DirCaches
    val m = c.newCache()
    def df(tag: String) = spark.range(1).toDF(tag)
    m.getOrElseUpdate((spark, "/a"), df("a"))
    val hit = df("a2")
    assert(m.getOrElseUpdate((spark, "/a"), hit) ne hit) // cached, not rebuilt
    c.evictOtherDirs(spark, "/b")
    assert(!m.contains((spark, "/a")), "other-dir entry must evict")
    m.getOrElseUpdate((spark, "/b"), df("b"))
    c.evictOtherDirs(spark, "/b")
    assert(m.contains((spark, "/b")), "hot-dir entry must survive")
    c.clear()
    assert(m.isEmpty)
  }
}
