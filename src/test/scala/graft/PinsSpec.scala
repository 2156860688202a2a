package graft

import org.apache.spark.storage.StorageLevel

/** Lifecycle of the operator-internal cache-pin registry (round-8 advice:
  * repeated operator passes in a long-lived session must not accumulate
  * cache blocks forever).
  */
class PinsSpec extends SparkSpec {
  import spark.implicits._

  test("pin persists MEMORY_AND_DISK; release unpersists and clears") {
    graft.util.Pins.release() // isolate from other suites in this JVM
    val before = graft.util.Pins.size
    assert(before == 0)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .transform(graft.util.Pins.pin)
    assert(graft.util.Pins.size == 1)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    df.count() // materialize the cache
    graft.util.Pins.release()
    assert(graft.util.Pins.size == 0)
    assert(df.storageLevel == StorageLevel.NONE)
    // releasing a pin is an optimization boundary, never a semantic one:
    // the plan still evaluates after the unpersist
    assert(df.count() == 2)
  }

  test("operators re-register pins on every invocation (fresh lifecycle)") {
    graft.util.Pins.release()
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ff"))
      .toDF("doc_id", "text")
    graft.ext.Dedup.minhashLshPairs(docs).count()
    val afterFirst = graft.util.Pins.size
    assert(afterFirst > 0, "LSH pass should register its pins")
    graft.util.Pins.release()
    assert(graft.util.Pins.size == 0)
    graft.ext.Dedup.minhashLshPairs(docs).count()
    assert(graft.util.Pins.size == afterFirst,
      "second pass should re-pin the same number of intermediates")
    graft.util.Pins.release()
  }

  test("scoped passes are isolated: a release in one pass cannot " +
    "unpersist another pass's pins (round-9 advice)") {
    graft.util.Pins.release()
    val outer = Seq((1L, "outer")).toDF("id", "v")
      .transform(graft.util.Pins.pin) // root-scope pin
    val (innerDf, innerSizeDuring) = graft.util.Pins.scoped {
      val d = Seq((2L, "inner")).toDF("id", "v")
        .transform(graft.util.Pins.pin)
      d.count()
      // a concurrent pass calling release() — here simulated from
      // another thread sitting in the ROOT scope — must not drop this
      // scope's pin
      val t = new Thread(() => graft.util.Pins.release())
      t.start(); t.join()
      assert(d.storageLevel != StorageLevel.NONE,
        "root release must not unpersist a scoped pin")
      (d, graft.util.Pins.size)
    }
    assert(innerSizeDuring == 1)
    // the other thread's root release dropped the root pin only
    assert(outer.storageLevel == StorageLevel.NONE)
    // scope exit released the inner pin
    assert(innerDf.storageLevel == StorageLevel.NONE)
    assert(graft.util.Pins.size == 0)
    graft.util.Pins.release()
  }
}
