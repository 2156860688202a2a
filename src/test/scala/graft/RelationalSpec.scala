package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Sampling}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    (1, 5, 1L, "a"), (1, 5, 2L, "a2"), (1, 9, 1L, "b")
  ).toDF("k", "ts", "tb", "v")
  private val left = Seq(
    (1, 5, "l1"), (1, 9, "l2"), (1, 12, "l3"), (2, 7, "l4")
  ).toDF("k", "ts", "name")

  test("asofJoin inclusive: latest right ≤ left ts, ties to max tieBreak") {
    val got = Relational.asofJoin(left, right, key = "k",
        leftTs = "ts", rightTs = "ts", payload = Seq("v"), tieBreak = "tb")
      .collect().map(r => r.getAs[String]("name") ->
        ((Option(r.getAs[Integer]("asof_ts")).map(_.toInt),
          Option(r.getAs[String]("asof_v"))))).toMap
    assert(got("l1") == ((Some(5), Some("a2"))))  // equal ts matches; tb=2 wins
    assert(got("l2") == ((Some(9), Some("b"))))
    assert(got("l3") == ((Some(9), Some("b"))))
    assert(got("l4") == ((None, None)))           // key 2 has no right rows
  }

  test("asofJoin strict: equal-ts right row is invisible") {
    val got = Relational.asofJoin(left, right, key = "k",
        leftTs = "ts", rightTs = "ts", payload = Seq("v"), tieBreak = "tb",
        strict = true)
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[String]("asof_v"))).toMap
    assert(got("l1") == None)          // nothing strictly before ts 5
    assert(got("l2") == Some("a2"))    // ts 9 sees the ts-5 winner
    assert(got("l3") == Some("b"))
    assert(got("l4") == None)
  }

  test("intervalJoin: closed bounds, multi-bucket spans pair exactly once") {
    val pts = Seq((1L, 10), (2L, 25), (3L, 99)).toDF("pid", "pts")
    val ivs = Seq((100L, 5, 30), (200L, 10, 10), (300L, 40, 60))
      .toDF("iid", "s", "e")
    // bucket = 8s → interval 100 spans buckets 0..3; each pair must
    // appear exactly once despite the replication
    val got = Relational.intervalJoin(pts, "pts", ivs, "s", "e",
        bucketSeconds = 8L)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // p1@10 ∈ [5,30] and ∈ [10,10] (closed both ends); p2@25 ∈ [5,30];
    // p3@99 covered by nothing → dropped
    assert(got == Seq((1L, 100L), (1L, 200L), (2L, 100L)))
  }

  test("overlapJoin: closed-bound overlap, multi-bucket pairs exactly once") {
    val l = Seq((1L, 0, 20), (2L, 35, 36), (3L, 90, 95))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 5, 50), (20L, 20, 21), (30L, 60, 80))
      .toDF("rid", "rs", "re")
    // bucket = 8s → (1,10) share buckets 0..2, (2,10) share bucket 4;
    // the first-shared-bin residual must emit each pair exactly once
    val got = Relational.overlapJoin(l, "ls", "le", r, "rs", "re",
        bucketSeconds = 8L)
      .select(col("lid"), col("rid")).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1))).sorted.toSeq
    // 1:[0,20] meets 10:[5,50] and touches 20:[20,21] at the closed
    // bound; 2:[35,36] ⊂ [5,50]; 3:[90,95] overlaps nothing
    assert(got == Seq((1L, 10L), (1L, 20L), (2L, 10L)))
  }

  // the r07 break: Tables.events ships ts as TIMESTAMP_NTZ on micros-
  // generation parquet, and CAST(TIMESTAMP_NTZ AS DOUBLE) throws — both
  // Relational ops must accept every time-like dtype the scans produce
  private def tsDf(rows: Seq[(Long, String)], id: String, ts: String,
                   dtype: String) = {
    val df = rows.toDF(id, "__s")
    df.withColumn(ts, col("__s").cast(dtype)).drop("__s")
  }

  for (dtype <- Seq("timestamp", "timestamp_ntz")) {
    test(s"intervalJoin on $dtype columns (q81 shape)") {
      val pts = tsDf(Seq(1L -> "2024-01-01 00:10:00",
        2L -> "2024-01-01 02:30:00", 3L -> "2024-01-02 00:00:00"),
        "pid", "pts", dtype)
      val ivs = Seq(
        (100L, "2024-01-01 00:00:00", "2024-01-01 01:30:00"),
        (200L, "2024-01-01 02:30:00", "2024-01-01 02:30:00"),
        (300L, "2024-01-01 05:00:00", "2024-01-01 06:00:00"))
        .toDF("iid", "__s0", "__s1")
        .withColumn("s0", col("__s0").cast(dtype))
        .withColumn("s1", col("__s1").cast(dtype)).drop("__s0", "__s1")
      val got = Relational.intervalJoin(pts, "pts", ivs, "s0", "s1",
          bucketSeconds = 3600L)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // p1 ∈ [00:00,01:30] (multi-bucket span, exactly once); p2 hits the
      // degenerate closed point-interval; p3 (next day) uncovered → drops
      assert(got == Seq((1L, 100L), (2L, 200L)))
    }

    test(s"overlapJoin on $dtype columns (q89 shape)") {
      def iv(rows: Seq[(Long, String, String)], id: String) =
        rows.toDF(id, "__s0", "__s1")
          .withColumn(s"${id}0", col("__s0").cast(dtype))
          .withColumn(s"${id}1", col("__s1").cast(dtype))
          .drop("__s0", "__s1")
      val a = iv(Seq(
        (1L, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
        (2L, "2024-01-01 06:00:00", "2024-01-01 06:30:00")), "a")
      val b = iv(Seq(
        (10L, "2024-01-01 01:00:00", "2024-01-01 04:00:00"),
        (20L, "2024-01-01 02:00:00", "2024-01-01 02:10:00"),
        (30L, "2024-01-01 08:00:00", "2024-01-01 09:00:00")), "b")
      val got = Relational.overlapJoin(a, "a0", "a1", b, "b0", "b1",
          bucketSeconds = 3600L)
        .select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // a1 spans 3 buckets with b10 (once), touches b20 at the closed
      // 02:00 bound; a2 overlaps nothing
      assert(got == Seq((1L, 10L), (1L, 20L)))
    }

    test(s"asofJoin on $dtype columns") {
      val l = tsDf(Seq(1L -> "2024-01-01 00:10:00",
        2L -> "2024-01-01 03:00:00"), "id", "lts", dtype)
        .withColumn("k", lit(1))
      val r = tsDf(Seq(10L -> "2024-01-01 00:00:00",
        20L -> "2024-01-01 02:00:00"), "rid", "rts", dtype)
        .withColumn("k", lit(1)).withColumn("v", col("rid") * 10)
      val got = Relational.asofJoin(l, r, key = "k", leftTs = "lts",
          rightTs = "rts", payload = Seq("v"), tieBreak = "rid")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("asof_v"))
        .toMap
      assert(got == Map(1L -> 100L, 2L -> 200L))
    }
  }

  test("asofJoin with DATE left ts and TIMESTAMP right ts coerces cleanly") {
    // mixed temporal dtypes across sides: the union's type coercion must
    // promote DATE → TIMESTAMP (midnight, exact under pinned UTC), not
    // fail or mis-order — the q79 shape if one side ever ships dates
    val l = Seq((1L, "2024-01-02"), (2L, "2024-01-05")).toDF("id", "__s")
      .withColumn("k", lit(1))
      .withColumn("lts", col("__s").cast("date")).drop("__s")
    val r = Seq((10L, "2024-01-01 12:00:00"), (20L, "2024-01-04 08:00:00"))
      .toDF("rid", "__s").withColumn("k", lit(1))
      .withColumn("rts", col("__s").cast("timestamp")).drop("__s")
      .withColumn("v", col("rid") * 10)
    val got = Relational.asofJoin(l, r, key = "k", leftTs = "lts",
        rightTs = "rts", payload = Seq("v"), tieBreak = "rid")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("asof_v"))
      .toMap
    // Jan 2 00:00 ≥ Jan 1 12:00; Jan 5 00:00 ≥ Jan 4 08:00
    assert(got == Map(1L -> 100L, 2L -> 200L))
  }

  test("weightedSamplePerGroup: per-group cap, weight dominance, jvm replay") {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 100L), ("s1", 3L, 100L),
      ("s1", 4L, 1000000000000L),                    // ~∞ weight → key ~0
      ("s2", 5L, 50L), ("s2", 6L, 50L)
    ).toDF("source", "doc_id", "n_chars")
    val got = Sampling.weightedSamplePerGroup(docs, "source", "doc_id",
      "n_chars", k = 2).collect()
    val byGroup = got.groupBy(_.getAs[String]("source"))
    assert(byGroup("s1").length == 2 && byGroup("s2").length == 2)
    assert(byGroup("s1").exists(_.getAs[Long]("doc_id") == 4L))

    // independent JVM-side replay of the coin/key arithmetic picks the
    // same s1 rows (MessageDigest here vs Spark's md5 expression there)
    def key(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|wsample".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) % 1000000L + 0.5) / 1e6
      BigDecimal(-math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = Seq(1L -> 100L, 2L -> 100L, 3L -> 100L,
        4L -> 1000000000000L)
      .sortBy { case (id, w) => (key(id, w), id) }.take(2).map(_._1).toSet
    assert(byGroup("s1").map(_.getAs[Long]("doc_id")).toSet == expect)
  }

  test("mixtureEpoch: capped source gets exactly ⌊w⌋ copies, fractional " +
    "source follows the coin, jvm replay matches") {
    // s1 is tiny → uncapped weight ≫ cap → exactly 5 copies per doc;
    // s2 carries ~99% of tokens → weight ≈ 0.505 → 0/1 copies by coin
    val docSource = ((1L to 4L).map(i => (i, "s1", 250L)) ++
      (10L to 59L).map(i => (i, "s2", 2000L)))
      .toDF("doc_id", "source", "n_tokens")
    val got = Sampling.mixtureEpoch(docSource).collect()
    val s1 = got.filter(_.getAs[String]("source") == "s1")
    assert(s1.length == 4 * 5)
    assert(s1.groupBy(_.getAs[Long]("doc_id"))
      .forall { case (_, rs) =>
        rs.map(_.getAs[Long]("copy")).sorted.toSeq == (0L to 4L) })

    // JVM replay of the weight→ppm→coin arithmetic for the s2 side
    val total = 4 * 250L + 50 * 2000L
    val w2 = math.min(5.0, 0.5 / (2000.0 * 50 / total))
    val w6 = BigDecimal(w2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val wPpm = (w6 * 1000000).toLong
    def coin(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|mixepoch".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expectS2 = (10L to 59L)
      .filter(id => wPpm / 1000000 + (if (coin(id) < wPpm % 1000000) 1 else 0) > 0)
      .toSet
    val s2 = got.filter(_.getAs[String]("source") == "s2")
    assert(s2.map(_.getAs[Long]("doc_id")).toSet == expectS2)
    assert(s2.forall(_.getAs[Long]("copy") == 0L))

    // ord is a 32-hex key, unique per (doc, copy) — the shuffle order
    val ords = got.map(_.getAs[String]("ord"))
    assert(ords.forall(_.matches("[0-9a-f]{32}")))
    assert(ords.distinct.length == ords.length)

    // deterministic under replay
    val again = Sampling.mixtureEpoch(docSource).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).toSet
    assert(again == got.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).toSet)
  }
}
