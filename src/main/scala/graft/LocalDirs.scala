package graft

/** Default `spark.local.dir` for the local harness mains (Bench / Verify /
  * BenchDebug).
  *
  * Shuffle map output, spill and disk-persisted blocks all land under the
  * local dir. In this sandbox `/tmp` sits on a virtio ext4 disk, and the
  * per-stage file create/open/mmap/delete round-trips are a measurable
  * share of the fixed per-job latency the sf0.1 bench is floor-bound by
  * (jstack over a synthetic 2-job loop: FileOutputStream.open0 +
  * getBooleanAttributes0 dominate RUNNABLE samples; the same loop runs
  * 0.23 s/iter on /tmp vs 0.16 s/iter on tmpfs). Guide §2.1: local disk
  * bandwidth for shuffle files can be the tighter limit — check both.
  *
  * Policy, in order:
  *   1. `SPARK_GRAFT_LOCAL_DIR` env — explicit override, any deployment.
  *   2. `/dev/shm` when it exists and is writable (Linux tmpfs, sized at
  *      half the box RAM — orders of magnitude above the suite's total
  *      shuffle volume at the fixture SFs).
  *   3. `/tmp` — Spark's own default.
  *
  * On a real cluster the resource manager exports SPARK_LOCAL_DIRS
  * pointing at the provisioned scratch NVMe, which overrides
  * `spark.local.dir` entirely — so this default only ever shapes local
  * single-box runs, and production keeps the deployment's disks. */
object LocalDirs {
  def default: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-spark-local"
    else "/tmp"
  })
}
