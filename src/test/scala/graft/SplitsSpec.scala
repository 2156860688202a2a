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

  test("clusterSplit: near-dup cluster members always share a split; " +
      "singletons reduce to hashSplit bit-for-bit") {
    // clusters: {1,2,3} -> cluster 1, {10,11} -> cluster 10
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L)).toDF("doc_id", "cluster_id")
    val got = Splits.clusterSplit(docs, clusters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.size == 2000)
    // leakage invariant: one split per cluster
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L)
    assert(got(10L) == got(11L))
    // singletons: same coin as the per-doc hash split
    val plain = Splits.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 2000L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(got(i) == ((i, plain(i))), s"singleton $i diverged")
    }
    // and members follow the CLUSTER id's coin — doc 2's split is what
    // a doc with id 1 would get, not what doc 2 alone would get
    assert(got(2L)._2 == plain(1L))
    assert(got(11L)._2 == plain(10L))
  }
}
