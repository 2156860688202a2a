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
  * materialized (written / collected) to drop every pin eagerly.
  * `graft.Verify` does exactly that after each query's parquet write;
  * `graft.Bench` deliberately does NOT (its warm passes are supposed to
  * reuse the pins — cache pressure there is bounded by LRU as usual).
  *
  * Releasing early is always SAFE (persist is an optimization, never a
  * semantic): a plan that still references a released pin just
  * recomputes.
  */
object Pins {
  private val pins = scala.collection.mutable.Buffer.empty[DataFrame]

  /** Persist `df` MEMORY_AND_DISK and register it for `release()`. */
  def pin(df: DataFrame): DataFrame = pins.synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    pins += p
    p
  }

  /** Unpersist every registered pin (skipping any whose session has been
    * stopped — unpersist on a dead context throws) and clear the registry.
    */
  def release(): Unit = pins.synchronized {
    pins.foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
    }
    pins.clear()
  }

  /** Number of live registered pins (for tests). */
  def size: Int = pins.synchronized(pins.size)
}
