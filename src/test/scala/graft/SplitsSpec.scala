package graft

import org.apache.spark.sql.functions._

import graft.ext.Splits

/** Deterministic hash-split assignment: total coverage, layout
  * independence, and roughly the requested proportions.
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).toDF("doc_id")

  test("every id gets exactly one label; rerun and repartition agree") {
    val a = Splits.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size == 2000)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    val b = Splits.hashSplit(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("proportions track the ppm thresholds") {
    val counts = Splits.hashSplit(docs).groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 90/5/5 ± generous sampling slack on 2000 ids
    assert(math.abs(counts("train") - 1800L) < 60,
      s"train=${counts("train")}")
    assert(counts.getOrElse("val", 0L) > 40 && counts("val") < 160)
    assert(counts.getOrElse("test", 0L) > 40 && counts("test") < 160)
  }

  test("different seeds give different assignments") {
    val a = Splits.hashSplit(docs, seed = "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val c = Splits.hashSplit(docs, seed = "other").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
  }
}
