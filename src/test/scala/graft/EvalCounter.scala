package graft

/** JVM-static evaluation counter for local-mode tests — ground truth for
  * "this lineage evaluated N row-visits", independent of Spark accumulator
  * reporting. */
object EvalCounter {
  val n = new java.util.concurrent.atomic.AtomicLong()
}
