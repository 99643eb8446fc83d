package graft.text

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for localCheckpoint'ed pipeline artifacts (MinHash
  * signatures, shingle sets, LSH candidate edges, simhash pairs, component
  * labels). At 100 TB these are PERSISTED artifacts every downstream query
  * reads; the memo is that artifact store's in-session stand-in.
  *
  * Contract kept honest for the benchmark: every cold build prints ONE
  * stderr line with its wall seconds, and [[totalColdBuildSeconds]]
  * accumulates them, so the bench can report artifact cost as its own
  * line item instead of letting pass-2 consumers read pre-built
  * checkpoints for free with the cost silently attributed nowhere.
  *
  * Keying: `applicationId@startTime` uniquely identifies a SparkContext
  * incarnation. (The previous `System.identityHashCode(sparkContext)` key
  * could be REUSED by a later context after the first is GC'd, handing a
  * new session stale checkpointed DataFrames bound to a dead context.)
  * Only one SparkContext is active per JVM, so on every access entries
  * keyed by any OTHER context are evicted — their checkpoint blocks died
  * with that context, and dropping them un-pins the DataFrames for the
  * rest of the JVM's lifetime.
  */
object ArtifactMemo {

  type Key = (String, String) // (context incarnation, sfDir)

  private val coldNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Total wall seconds spent on cold artifact builds in this JVM. */
  def totalColdBuildSeconds: Double = coldNanos.get() / 1e9

  private def ctxKey(s: SparkSession): String =
    s.sparkContext.applicationId + "@" + s.sparkContext.startTime

  def memo(cache: ConcurrentHashMap[Key, DataFrame], label: String,
           s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    memoAny(cache, label, s, dir)(build)

  /** Same memo for non-DataFrame artifacts (e.g. an on-disk table layout's
    * base PATH): identical keying, eviction, and cold-build accounting.
    */
  def memoAny[A](cache: ConcurrentHashMap[Key, A], label: String,
                 s: SparkSession, dir: String)(build: => A): A = {
    val ck = ctxKey(s)
    cache.keySet.removeIf(k => k._1 != ck)
    var built = false
    val t0 = System.nanoTime()
    val v = cache.computeIfAbsent((ck, dir), _ => { built = true; build })
    if (built) {
      val dt = System.nanoTime() - t0
      coldNanos.addAndGet(dt)
      System.err.println(f"[memo] $label%-18s cold build ${dt / 1e9}%6.2f s  ($dir)")
    }
    v
  }
}
