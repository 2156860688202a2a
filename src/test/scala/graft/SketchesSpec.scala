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

  test("hll small regime: linear counting from the literal table, and " +
      "the bound holds where the raw estimate biased low") {
    // 40 distinct keys against m = 256 is deep in the small regime: the
    // raw harmonic estimate biases low (expected-false within_bound was
    // the pre-fix behavior); the LC branch must kick in with EXACTLY the
    // literal-table value m·ln(m/V) — the same bits the SQL mirror reads
    val df = spark.range(40).select(col("id").as("k"), lit(1).as("g"))
    val row = Sketches.hllDistinct(df, col("k"), Seq(col("g")))
      .collect().head
    val nonzero = row.getAs[Long]("nonzero_registers")
    assert(nonzero < Sketches.M)
    val v = (Sketches.M - nonzero).toInt
    assert(row.getAs[Double]("hll_estimate") ===
      Sketches.HllLcTable(v - 1))
    assert(row.getAs[Boolean]("within_bound"),
      s"LC estimate ${row.getAs[Double]("hll_estimate")} outside the " +
        s"bound for exact ${row.getAs[Long]("exact_distinct")}")
    // the raw branch still rules when the gate is not met
    assert(Sketches.HllLcTable.length === Sketches.M - 1)
  }

  test("hll and kmv null contract: NULL keys never enter the sketch") {
    // a null key under concat_ws would hash as the bare tag and count as
    // one phantom distinct; the operators must filter it so Spark agrees
    // with the null-propagating SQL mirrors
    val df = ((1L to 30L).map(k => (Option(k), "g")) :+
      ((None: Option[Long]), "g"))
      .toDF("k", "g")
    val withNull = Sketches.hllDistinct(df, col("k"), Seq(col("g")))
      .collect().head
    val without = Sketches.hllDistinct(df.filter(col("k").isNotNull),
      col("k"), Seq(col("g"))).collect().head
    assert(withNull.getAs[Long]("denom_scaled") ===
      without.getAs[Long]("denom_scaled"))
    assert(withNull.getAs[Long]("exact_distinct") === 30L)
    val kmvNull = Sketches.kmvSketch(df, col("k"), col("g")).collect()
    val kmvNo = Sketches.kmvSketch(df.filter(col("k").isNotNull),
      col("k"), col("g")).collect()
    assert(kmvNull.map(_.toSeq).toSet === kmvNo.map(_.toSeq).toSet)
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

  test("hll registers max-merge: sketch(A ∪ B) = merge(sketch A, sketch B)") {
    // the mergeability that makes the sketch a partial aggregate and a
    // cross-day roll-up: registers of the union equal the per-part
    // registers merged by max
    import graft.ext.Sketches.hllRegisterCols
    def regs(lo: Long, hi: Long) = {
      val (j, rank) = hllRegisterCols(col("k"))
      (lo until hi).toDF("k").select(j.as("j"), rank.as("rank"))
        .groupBy("j").agg(max(col("rank")).as("mj"))
    }
    val whole = regs(0L, 20000L).collect()
      .map(r => r.getAs[Long]("j") -> r.getAs[Int]("mj")).toMap
    val merged = (regs(0L, 9000L).collect() ++ regs(9000L, 20000L).collect())
      .groupBy(_.getAs[Long]("j"))
      .map { case (j, rs) => j -> rs.map(_.getAs[Int]("mj")).max }
    assert(merged === whole)
  }

  test("cms grids add: grid(A ∪ B) = grid(A) + grid(B) cell-wise") {
    def grid(lo: Int, hi: Int) = {
      val keys = (lo until hi).map(i => s"w${i % 7}").toDF("word")
      keys.select((0 until Sketches.CmDepth).map(i =>
          Sketches.cmBucket(col("word"), i).as(s"b$i")): _*)
        .collect()
        .flatMap(r => (0 until Sketches.CmDepth).map(i =>
          (i, r.getAs[Long](s"b$i"))))
        .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    }
    val whole = grid(0, 500)
    val a = grid(0, 200)
    val b = grid(200, 500)
    val merged = (a.keySet ++ b.keySet).map(c =>
      c -> (a.getOrElse(c, 0L) + b.getOrElse(c, 0L))).toMap
    assert(merged === whole)
  }

  test("dcm quantiles are exact on a clean uniform ladder") {
    // 1..100 once each: ⌈φ·100⌉ is the φ-quantile by definition, and at
    // 100 distinct values the decomposition path is collision-light so
    // the estimate should land exactly
    val df = (1L to 100L).toDF("v")
    val out = Sketches.dyadicCmQuantiles(df, "v")
      .collect().map(r => r.getAs[Long]("phi_ppm") ->
        (r.getAs[Long]("target_rank"), r.getAs[Long]("q_est"),
          r.getAs[Long]("q_exact"), r.getAs[Boolean]("est_le_exact")))
      .toMap
    assert(out(500000L) === ((50L, 50L, 50L, true)))
    assert(out(990000L) === ((99L, 99L, 99L, true)))
    assert(out.values.forall(_._4))
  }

  test("dcm rank estimates are one-sided: est_rank ≥ true_rank pointwise") {
    // 6000 distinct values force genuine collisions in the 64-bucket
    // low levels; the node estimate min-over-d can only overcount, so
    // every prefix rank estimate must sit at or above the truth and the
    // estimated quantile can only come early
    val df = (0L until 6000L).toDF("v")
    val vs = Sketches.dcmClamp(df, "v")
    val cells = Sketches.dcmGrid(vs).collect()
      .map(r => (r.getAs[Int]("lvl"), r.getAs[Int]("row_i"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    def estRank(x: Long): Long = {
      val y = x + 1
      (0 until Sketches.DcmLevels).collect {
        case b if ((y >> b) & 1L) == 1L =>
          val node = (y >> b) - 1
          (0 until Sketches.CmDepth).map { i =>
            val s = s"dcm|$i|$b|$node"
            val bucket = half(s, 1) % Sketches.DcmWidth
            cells.getOrElse((b, i, bucket), 0L)
          }.min
      }.sum
    }
    val probes = Seq(0L, 1L, 137L, 1500L, 2999L, 4242L, 5999L)
    probes.foreach { x =>
      assert(estRank(x) >= x + 1, s"est_rank($x) undercounts")
    }
    // collisions actually fired somewhere (the overcount path is
    // exercised, not vacuously true)
    assert(probes.map(x => estRank(x) - (x + 1)).max > 0)
    val out = Sketches.dyadicCmQuantiles(df, "v").collect()
    assert(out.forall(_.getAs[Boolean]("est_le_exact")))
  }

  test("dcm histogram grid equals the direct grid cell-for-cell") {
    val df = Sketches.dcmClamp(
      (0L until 3000L).map(v => v * 7 % 1200).toDF("v"), "v")
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Int]("lvl"), r.getAs[Int]("row_i"),
        r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val direct = toMap(Sketches.dcmGrid(df))
    val viaHist = toMap(Sketches.dcmGridFromCounts(
      df.groupBy(col("x")).agg(count(lit(1)).as("vcnt"))))
    assert(direct === viaHist)
  }

  test("dcm grids add: grid(A ∪ B) = grid(A) + grid(B) cell-wise") {
    def grid(lo: Long, hi: Long): Map[(Int, Int, Long), Long] =
      Sketches.dcmGrid(Sketches.dcmClamp(
          (lo until hi).map(v => v * 17 % 4096).toDF("v"), "v"))
        .collect()
        .map(r => (r.getAs[Int]("lvl"), r.getAs[Int]("row_i"),
          r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val whole = grid(0, 900)
    val a = grid(0, 400)
    val b = grid(400, 900)
    val merged = (a.keySet ++ b.keySet).map(c =>
      c -> (a.getOrElse(c, 0L) + b.getOrElse(c, 0L))).toMap
    assert(merged === whole)
  }

  test("dcm grouped quantiles: each group equals the ungrouped run on " +
      "its slice") {
    // group isolation — the per-group grid must answer exactly what the
    // single-group operator answers on that group's rows alone
    val rows = (1L to 400L).map(v => ("a", v)) ++
      (1L to 90L).map(v => ("b", v * 11))
    val df = rows.toDF("g", "v")
    val grouped = Sketches.dyadicCmQuantilesByGroup(df, "v", "g")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("phi_ppm")) ->
        (r.getAs[Long]("q_est"), r.getAs[Long]("q_exact"))).toMap
    for (g <- Seq("a", "b")) {
      val solo = Sketches.dyadicCmQuantiles(
          df.filter(col("g") === g).select(col("v")), "v")
        .collect()
        .map(r => r.getAs[Long]("phi_ppm") ->
          (r.getAs[Long]("q_est"), r.getAs[Long]("q_exact"))).toMap
      solo.foreach { case (phi, qq) =>
        assert(grouped((g, phi)) === qq, s"group $g phi $phi diverged")
      }
    }
  }

  test("dcm clamp pins the sketch domain") {
    val df = Seq(-5L, 0L, 70000L, Sketches.DcmMax).toDF("v")
    val xs = Sketches.dcmClamp(df, "v").collect().map(_.getAs[Long]("x"))
    assert(xs.toSeq === Seq(0L, 0L, Sketches.DcmMax, Sketches.DcmMax))
  }

  test("kmv degenerates to EXACT intersection below k distinct keys") {
    // two groups, 40 and 50 keys, 20 shared — all under k=256, so
    // θ = 2^56 (sampling fraction 1) and the estimate must be exact
    val rows = ((1L to 40L).map(("a", _)) ++ (21L to 70L).map(("b", _)))
      .toDF("g", "k")
    val out = Sketches.kmvPairIntersect(rows, col("k"), col("g"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("theta") === (1L << 56))
    assert(r.getAs[Long]("exact_inter") === 20L)
    assert(r.getAs[Long]("inter_sample") === 20L)
    assert(r.getAs[Double]("kmv_inter_estimate") === 20.0)
  }

  test("kmv threshold matches the by-hand kth-smallest replay") {
    val n = 2000L
    val rows = (1L to n).map(("a", _)).toDF("g", "k")
    val sk = Sketches.kmvSketch(rows, col("k"), col("g")).collect()
    assert(sk.length === Sketches.KmvK)
    // by hand: pack((md5 "kmv|i")) for all i, take kth smallest
    def packed(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var l = 0L
      (0 until 8).foreach(i => l = (l << 8) | (d(i) & 0xffL))
      ((l >>> 36) << 28) | ((l >>> 8) & 0xfffffffL)
    }
    val hand = (1L to n).map(i => packed(s"kmv|$i")).sorted
      .take(Sketches.KmvK)
    assert(sk.map(_.getAs[Long]("h")).sorted.toSeq === hand)
    assert(sk.head.getAs[Long]("hk") === hand.last)
  }

  test("kmv estimate lands near a planted 20k-key overlap") {
    // |A| = 60k, |B| = 60k, |A∩B| = 20k planted exactly
    val rows = ((0L until 60000L).map(("a", _)) ++
      (40000L until 100000L).map(("b", _))).toDF("g", "k")
    val r = Sketches.kmvPairIntersect(rows, col("k"), col("g"))
      .collect().head
    assert(r.getAs[Long]("exact_inter") === 20000L)
    val rel = math.abs(r.getAs[Double]("rel_err"))
    // union-scale σ ≈ 1/√k ≈ 6.3 %, inflated by the 1/5 overlap share;
    // 3σ on the intersection ≈ 0.3 — pin generously, the value itself
    // is hash-checked in q95
    assert(rel < 0.3, s"kmv intersection off by $rel")
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
