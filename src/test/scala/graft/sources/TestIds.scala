package graft.sources

/** JVM-unique suffixes for per-test CATALOG names. Spark caches
  * catalog instances per name, so a reused name keeps resolving the
  * FIRST base directory it was configured with — the old
  * `tempDir.hashCode % 1000` suffixes collided ~4%/run across the
  * suite's ~19 call sites and made an unrelated test's tables appear
  * under this test's catalog. A monotone counter cannot collide
  * within a JVM. */
object TestIds {
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  def next(): Int = n.incrementAndGet()
}
