package graft

import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join (ops/BloomJoin.scala): the screen is a
  * pure row reducer — never drops a true match (one-sided), shrinks the
  * fact side toward the dim selectivity, and the final join is EXACTLY
  * the semi join.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomScreen keeps every true match and shrinks the fact side") {
    val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "payload")
    val dim = (1L to 250L).map(i => i * 20).toDF("dk") // 5 % selectivity
    val screened = graft.ops.BloomJoin.bloomScreen(fact, "k", dim, "dk")
    val screenedKeys = screened.select("k").as[Long].collect().toSet
    val trueKeys = (1L to 250L).map(_ * 20).filter(_ <= 5000L).toSet
    // one-sided: no true match lost
    assert(trueKeys.subsetOf(screenedKeys))
    // the screen actually reduces: survivors ≈ matches + fpp·rest
    assert(screenedKeys.size < 1000,
      s"screen kept ${screenedKeys.size} of 5000")
  }

  test("bloomSemiJoin equals the exact semi join, columns unchanged") {
    val fact = (1L to 3000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val dim = (1L to 3000L).filter(_ % 7 == 0).map(i => (i, "d"))
      .toDF("dk", "junk")
    val got = graft.ops.BloomJoin.bloomSemiJoin(fact, "k", dim, "dk")
    assert(got.columns.toSeq == Seq("k", "payload"))
    val want = fact.join(dim.select(col("dk").as("k")).distinct(),
      Seq("k"), "left_semi")
    assert(got.as[(Long, String)].collect().toSet ===
      want.as[(Long, String)].collect().toSet)
  }

  test("null dim keys are ignored; null fact keys never match") {
    val fact = Seq(Some(1L), Some(2L), None).toDF("k")
    val dim = Seq(Some(1L), None).toDF("dk")
    val got = graft.ops.BloomJoin.bloomSemiJoin(fact, "k", dim, "dk")
      .as[Option[Long]].collect().toSet
    assert(got === Set(Some(1L)))
  }

  test("inputs already carrying a reserved __gbj_ column fail fast " +
      "instead of silently corrupting the screen") {
    val fact = Seq((1L, 0L)).toDF("k", "__gbj_h1")
    val dim = Seq(1L).toDF("dk")
    val e = intercept[IllegalArgumentException] {
      graft.ops.BloomJoin.bloomScreen(fact, "k", dim, "dk")
    }
    assert(e.getMessage.contains("__gbj_h1"))
  }
}
