package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persisted intermediates (the LSH shingle
  * /band tables, the novelty gram table, SemDeDup cells, …).
  *
  * The extension operators pin multi-consumer intermediates
  * MEMORY_AND_DISK because every consumer of the returned plan would
  * otherwise recompute a corpus-scale stage (measured 222 s → 64 s on the
  * 1M-doc TextScale LSH pass). Those pins are owned by the LIBRARY, not
  * the caller — but a long-lived session that runs many operator passes
  * would accumulate cache blocks until LRU eviction (round-8 advice).
  * Routing them through this registry keeps the speedup AND gives
  * lifecycle control: call `release()` once the results of a pass are
  * materialized (written / collected) to drop every pin of the CURRENT
  * scope eagerly. `graft.Verify` does exactly that after each query's
  * parquet write; `graft.Bench` deliberately does NOT (its warm passes
  * are supposed to reuse the pins — cache pressure there is bounded by
  * LRU as usual).
  *
  * Scoping (round-9 advice): the registry is per-PASS, not per-JVM.
  * `scoped { … }` opens a fresh scope on the current thread — pins
  * registered inside it (by any operator the pass calls) belong to that
  * scope alone and are released when the block exits, so two concurrent
  * operator passes in one JVM (parallel test suites, an embedding
  * long-lived server) can no longer unpersist each other's
  * multi-consumer intermediates mid-pipeline. Passes that never open a
  * scope fall back to a shared root scope with the old semantics
  * (`release()` drops every root pin — single-pass-at-a-time contract).
  * The scope handle is thread-local; a pass that builds plans on one
  * thread releases on that thread, which is how every in-repo caller
  * (Verify's sequential query loop, the harness mains, the specs) runs.
  *
  * Releasing early is always SAFE (persist is an optimization, never a
  * semantic): a plan that still references a released pin just
  * recomputes.
  */
object Pins {
  private final class Scope {
    val pins = scala.collection.mutable.Buffer.empty[DataFrame]
  }
  private val root = new Scope
  private val current = new ThreadLocal[Scope] {
    override def initialValue(): Scope = root
  }

  private def drop(s: Scope): Unit = s.synchronized {
    s.pins.foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
    }
    s.pins.clear()
  }

  /** Persist `df` MEMORY_AND_DISK and register it with the current
    * thread's active scope (the shared root scope outside `scoped`).
    */
  def pin(df: DataFrame): DataFrame = {
    val s = current.get()
    s.synchronized {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      s.pins += p
      p
    }
  }

  /** Run `body` in a fresh pin scope: every pin registered on this
    * thread inside it is released (unpersisted) when the block exits,
    * and `release()` calls from OTHER passes cannot touch them.
    */
  def scoped[T](body: => T): T = {
    val prev = current.get()
    val s = new Scope
    current.set(s)
    try body
    finally {
      current.set(prev)
      drop(s)
    }
  }

  /** Unpersist every pin of the current scope (skipping any whose
    * session has been stopped — unpersist on a dead context throws) and
    * clear it. Outside `scoped` this is the shared root scope: callers
    * relying on it assume one operator pass at a time per JVM.
    */
  def release(): Unit = drop(current.get())

  /** Number of live pins in the current scope (for tests). */
  def size: Int = {
    val s = current.get()
    s.synchronized(s.pins.size)
  }
}
