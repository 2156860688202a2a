package graft

import org.apache.spark.sql.functions._

import graft.ext.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side replica of the engine-portable hash: first/second 7 hex
    * digits of md5("tag|key") — the ground truth both Spark and DuckDB
    * must reproduce.
    */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def half(s: String, lo: Int): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(lo - 1, lo - 1 + 7), 16)

  test("hll registers and denominator match a by-hand replay") {
    val keys = (1L to 2000L).toSeq
    val df = keys.toDF("k").withColumn("g", lit("all"))
    val out = Sketches.hllDistinct(df, col("k"), Seq(col("g"))).collect()
    assert(out.length === 1)
    val row = out.head
    // by-hand: the same md5-halves registers, exact integer denominator
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    keys.foreach { k =>
      val s = s"hll|$k"
      val j = half(s, 1) % Sketches.M
      val h2 = half(s, 8)
      val rank =
        if (h2 == 0) Sketches.MaxRank
        else Sketches.MaxRank - java.lang.Long.toBinaryString(h2).length
      regs(j) = math.max(regs.getOrElse(j, 0), rank)
    }
    val denom = regs.values.map(mj => 1L << (Sketches.MaxRank - mj)).sum +
      (Sketches.M - regs.size).toLong * (1L << Sketches.MaxRank)
    assert(row.getAs[Long]("nonzero_registers") === regs.size.toLong)
    assert(row.getAs[Long]("denom_scaled") === denom)
    assert(row.getAs[Long]("exact_distinct") === 2000L)
    // the estimate is the one shared literal over that exact integer —
    // reproducible to the bit
    assert(row.getAs[Double]("hll_estimate") ===
      Sketches.HllScale / denom.toDouble)
  }

  test("hll estimate lands within the 3-sigma bound at n >> 2.5m") {
    // 50k distinct keys against m = 256: deep in the raw-HLL regime
    // (no linear-counting correction needed, and none is applied)
    val df = spark.range(50000).select(col("id").as("k"), lit(1).as("g"))
    val row = Sketches.hllDistinct(df, col("k"), Seq(col("g")))
      .collect().head
    assert(row.getAs[Boolean]("within_bound"),
      s"rel_err ${row.getAs[Double]("rel_err")} outside ±${Sketches.HllBound}")
    // duplicates must not move a distinct sketch: union the corpus with
    // itself and the registers (hence the whole row) are unchanged
    val dup = Sketches.hllDistinct(df.union(df), col("k"), Seq(col("g")))
      .collect().head
    assert(dup.getAs[Long]("denom_scaled") ===
      row.getAs[Long]("denom_scaled"))
    assert(dup.getAs[Double]("hll_estimate") ===
      row.getAs[Double]("hll_estimate"))
  }

  test("hll denominator stays exact dyadic (fits well under 2^53)") {
    // worst case: every register empty except impossible — bound is
    // m * 2^MaxRank = 2^37, far inside the 53-bit exact-integer range,
    // so the sum is order-independent in ANY IEEE engine
    assert(Sketches.M.toLong * (1L << Sketches.MaxRank) === (1L << 37))
  }

  test("cms estimates are one-sided and exact for collision-free rows") {
    // heavy-tailed counts: key i appears i times
    val keys = (1 to 40).flatMap(i => Seq.fill(i)(s"w$i"))
    val df = keys.toDF("word")
    val out = Sketches.cmHeavyHitters(df, "word").collect()
    assert(out.length === 40)
    out.foreach { r =>
      assert(r.getAs[Boolean]("overcount_ok"),
        s"${r.getAs[String]("word")}: est < true")
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt"))
    }
    // the min-over-rows can only help: est is bounded by the single
    // worst row's bucket load, and with 40 keys in 4x32 buckets at
    // least the head key must estimate close to exactly (its count
    // dominates any collision partner)
    val total = keys.size.toLong
    val heavy = out.filter(_.getAs[Boolean]("is_heavy"))
    // true heavy hitters (>= 1% of 820 = 8.2 -> count >= 9, i.e. i >= 9)
    // must all be flagged: one-sidedness means no false negatives
    val trueHeavy = (1 to 40).filter(i => i * 100L >= total)
    assert(trueHeavy.toSet.subsetOf(
      heavy.map(_.getAs[String]("word").drop(1).toInt).toSet))
  }

  test("cms bucket arithmetic matches the by-hand md5 replay") {
    val df = Seq("alpha", "beta").toDF("word")
    val out = Sketches.cmHeavyHitters(df, "word")
      .collect().map(r => r.getAs[String]("word") -> r).toMap
    // est of a 1-count word equals min over rows of its bucket load;
    // with only two words, load is 1 unless the words collide in a row
    (0 until Sketches.CmDepth).foreach { i =>
      val ba = half(s"cm|$i|alpha", 1) % Sketches.CmWidth
      val bb = half(s"cm|$i|beta", 1) % Sketches.CmWidth
      if (ba != bb) {
        assert(out("alpha").getAs[Long]("est_cnt") >= 1L)
      }
    }
    assert(out("alpha").getAs[Long]("true_cnt") === 1L)
    assert(out("beta").getAs[Long]("true_cnt") === 1L)
  }
}
