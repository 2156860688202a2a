package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality and frequency sketches — the bounded-state summaries a
  * 100 TB engine aggregates instead of raw values.
  *
  * Both sketches here are built from the repo's engine-portable md5
  * arithmetic (the `Md5HalvesExpr` / `CAST('0x'||substr(md5(x),1,7) AS
  * BIGINT)` convention proven by the MinHash/Bloom/sampling operators), so
  * the ENTIRE sketch — registers, buckets, estimates — replays bit-for-bit
  * in DuckDB and sits under the hash gate, not behind an "approximate, so
  * rows-only" excuse.
  *
  * Scale design:
  *  - HyperLogLog: `count(distinct x)` shuffles every distinct value;
  *    the HLL register table shuffles at most `m` rows per group
  *    regardless of cardinality, and registers merge by `max` — the
  *    associative/commutative shape that makes partial aggregation and
  *    multi-day sketch roll-ups free. m = 256 (p = 8) gives a 1.04/√m
  *    ≈ 6.5 % standard error from a 256-row summary.
  *  - Count-Min: exact per-key counts of a heavy-tailed key need a
  *    key-cardinality shuffle; the CM sketch is a fixed d×w grid of
  *    counters merged by `+`, with the classic one-sided guarantee
  *    (estimate ≥ true, overshoot ≤ εN with probability 1−δ). Heavy
  *    hitters are then probed against the grid with d broadcast lookups.
  *
  * Determinism discipline (what makes the estimates hash-checkable):
  *  - the harmonic denominator is kept SCALED AS AN INTEGER —
  *    Σⱼ 2^(R−Mⱼ) with R = 29 the max rank — so the sum is exact dyadic
  *    arithmetic (max 256·2²⁹ = 2³⁷ ≪ 2⁵³), independent of aggregation
  *    order in both engines;
  *  - the estimate is then ONE IEEE division of two bit-identical
  *    doubles: a Scala-printed literal constant (α·m²·2^R — the stashed-
  *    literal convention of the trained quantizers) over the exact
  *    denominator. No `ln`, no transcendentals, no order-dependent fp
  *    sums EVALUATED IN either engine's checked columns — the small-
  *    range linear-counting branch does need m·ln(m/V), but V is an
  *    exact integer in [1, 255], so all 255 possible values ship as
  *    precomputed literals ([[HllLcTable]]) to both engines;
  *  - NULL keys are excluded before hashing everywhere (operator filter
  *    + mirror WHERE) — Spark's null-skipping concat_ws and DuckDB's
  *    null-propagating `||` would otherwise disagree on null-bearing
  *    key columns.
  *
  * Reference context: the reference repo (563-line pandas pipelines) has
  * no sketch surface; these belong to the training-data extension
  * (SURVEY §2.12) — distinct-count profiling and heavy-hitter detection
  * are standing stages of corpus curation at scale.
  */
object Sketches {

  /** Register count m = 2^P. P = 8 keeps the per-group summary at 256
    * rows and the scaled denominator far inside exact-long range.
    */
  val P = 8
  val M: Int = 1 << P // 256

  /** Max rank: h2 has 28 bits, so rank = (leading zeros in the 28-bit
    * word) + 1 ∈ [1, 29]; an empty register holds 0.
    */
  val MaxRank = 29

  /** α_m · m² · 2^R as one double literal (m = 256, R = 29) — the only
    * non-integer constant in the estimate, shared verbatim with the SQL
    * mirror via its shortest-round-trip decimal form.
    */
  val HllScale: Double =
    0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble *
      (1L << MaxRank).toDouble

  /** ±3σ relative-error acceptance bound, σ = 1.04/√m. */
  val HllBound: Double = 3.0 * 1.04 / math.sqrt(M.toDouble)

  /** Linear-counting table for the small regime: entry V (1-based) is
    * m·ln(m/V) for V empty registers. The ln is a TRANSCENDENTAL — but
    * it never runs inside either engine: all 255 possible values (V is
    * an exact integer in [1, 255]) are computed HERE once and shipped to
    * both engines as shortest-round-trip literals, so the corrected
    * estimate stays bit-identical cross-engine (the stashed-literal
    * convention of the trained quantizers).
    */
  val HllLcTable: Seq[Double] =
    (1 to M - 1).map(v => M.toDouble * math.log(M.toDouble / v))

  /** Raw-estimate threshold below which linear counting applies (the
    * standard Flajolet small-range correction gate): E_raw ≤ 2.5·m.
    */
  val HllLcGate: Double = 2.5 * M

  /** (register index, rank) of one key draw — THE hash arithmetic of the
    * sketch, shared verbatim by the batch operator, the streaming twin
    * ([[graft.streaming.StreamOps.streamingHllRegisters]]) and (in SQL
    * form) the DuckDB mirror, so all three produce identical registers.
    * One NATIVE digest per row (`Md5HalvesExpr` packs both 28-bit halves
    * — bit-identical to the `conv(substr(md5))` form the mirror replays,
    * which would pay two digests plus a hex round-trip per row).
    */
  def hllRegisterCols(key: Column, tag: String = "hll"): (Column, Column) = {
    val s = concat_ws("|", lit(tag), key.cast("string"))
    val packed = org.apache.spark.sql.graft.GraftExprBridge.md5Halves(s)
    val h1 = shiftrightunsigned(packed, 28)
    val h2 = packed bitwiseAND lit((1L << 28) - 1)
    val rank = when(h2 === 0, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(h2)))
    (h1 % M, rank)
  }

  /** Fold a (g…, j, mj) register table into per-group (nonzero_registers,
    * denom_scaled, hll_estimate) — the read side of the sketch, shared by
    * [[hllDistinct]] and consumers of streamed register state. `gs` are
    * the group column names.
    */
  def hllEstimateFromRegisters(regs: DataFrame, gs: Seq[String]): DataFrame = {
    // 2^(R−mj) is exact in double for mj ∈ [1,29] and the cast truncates
    // an exact integer — identical in Spark (truncating cast) and DuckDB
    // (rounding cast) because there is nothing to round.
    val term = pow(lit(2.0), lit(MaxRank) - col("mj")).cast("long")
    val raw = lit(HllScale) / col("denom_scaled").cast("double")
    // small-range correction: when the raw estimate is ≤ 2.5m and empty
    // registers remain, linear counting m·ln(m/V) is the better (and
    // Flajolet-standard) estimator — without it, within_bound is
    // expected-false for n ≪ m. V = m − nonzero_registers is an exact
    // integer, and the LC value comes from the literal HllLcTable, so
    // the branch hash-checks like the raw path.
    val v = (lit(M) - col("nonzero_registers")).cast("int")
    regs.groupBy(gs.map(col): _*)
      .agg(count(lit(1)).as("nonzero_registers"),
        sum(term).as("present_sum"))
      .withColumn("denom_scaled", col("present_sum") +
        (lit(M.toLong) - col("nonzero_registers")) * lit(1L << MaxRank))
      .drop("present_sum")
      .withColumn("hll_estimate",
        when(col("nonzero_registers") < M && raw <= lit(HllLcGate),
          element_at(typedLit(HllLcTable), v))
          .otherwise(raw))
  }

  /** Per-group HyperLogLog distinct estimate of `key`, hash-checked
    * against the exact count.
    *
    * Output: one row per group —
    * (groupCols…, m, nonzero_registers, denom_scaled, hll_estimate,
    * exact_distinct, rel_err, within_bound). Every column is either
    * exact integer arithmetic or a single-division double (see class
    * doc), so the whole row hash-matches the DuckDB replay.
    *
    * The register table (groupCols × register → max rank) is the
    * shuffle payload — ≤ m rows per group. `exact_distinct` is the
    * verification column; a production profile at 100 TB would drop it
    * (that is the point of the sketch).
    *
    * Null contract: NULL keys are excluded from the sketch (filtered
    * before hashing), matching both `countDistinct`'s exclusion on the
    * exact side and the SQL mirror's null-propagating `||` concat —
    * without the filter, Spark's null-skipping concat_ws would hash a
    * NULL key as the bare tag and silently count it as one distinct.
    */
  def hllDistinct(df: DataFrame, key: Column, groupCols: Seq[Column],
      tag: String = "hll"): DataFrame = {
    // one digest per row; h1 → register, h2 → rank source. The "tag|"
    // prefix domain-separates this sketch's draws from every other md5
    // consumer (the SmurfGen tag-keyed idiom).
    val (j, rank) = hllRegisterCols(key, tag)
    val named = groupCols.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val df0 = df.filter(key.isNotNull)
    val gs = named.indices.map(i => col(s"g$i"))
    val gNames = named.indices.map(i => s"g$i")
    val regs = df0
      .select(named :+ j.as("j") :+ rank.as("rank"): _*)
      .groupBy(gs :+ col("j"): _*)
      .agg(max(col("rank")).as("mj"))
    val perGroup = hllEstimateFromRegisters(regs, gNames)
    val exact = df0
      .select(named :+ key.as("k"): _*)
      .groupBy(gs: _*)
      .agg(countDistinct(col("k")).as("exact_distinct"))
    perGroup.join(exact, gNames)
      .select(gs :+ lit(M).as("m") :+ col("nonzero_registers") :+
        col("denom_scaled") :+ col("exact_distinct") :+
        col("hll_estimate"): _*)
      .withColumn("rel_err",
        (col("hll_estimate") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"))
      .withColumn("within_bound", abs(col("rel_err")) <= lit(HllBound))
  }

  /** DuckDB mirror of [[hllDistinct]] over a single group column. The
    * arithmetic is the same to the bit: hex-cast md5 halves, bin-length
    * rank, integer-scaled denominator, the one shared double literal —
    * and the identical literal linear-counting table for the small
    * regime. NULL keys are filtered explicitly (the operator's null
    * contract).
    */
  def hllSql(table: String, keyExpr: String, groupCol: String,
      tag: String = "hll"): String = {
    val s = s"'$tag' || '|' || CAST($keyExpr AS VARCHAR)"
    s"""WITH h AS (
       |  SELECT $groupCol AS g0,
       |    CAST(('0x' || substr(md5($s), 1, 7)) AS BIGINT) AS h1,
       |    CAST(('0x' || substr(md5($s), 8, 7)) AS BIGINT) AS h2,
       |    $keyExpr AS k
       |  FROM $table
       |  WHERE $keyExpr IS NOT NULL
       |),
       |regs AS (
       |  SELECT g0, h1 % $M AS j,
       |    max(CASE WHEN h2 = 0 THEN $MaxRank
       |             ELSE $MaxRank - length(bin(h2)) END) AS mj
       |  FROM h GROUP BY 1, 2
       |),
       |per_group AS (
       |  SELECT g0, CAST(count(*) AS BIGINT) AS nonzero_registers,
       |    CAST(sum(CAST(power(2, $MaxRank - mj) AS BIGINT)) AS BIGINT)
       |      AS present_sum
       |  FROM regs GROUP BY 1
       |),
       |exact AS (
       |  SELECT g0, CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct
       |  FROM h GROUP BY 1
       |),
       |est AS (
       |  -- the raw harmonic estimate, then the same literal-table
       |  -- linear-counting branch the Spark operator applies in the
       |  -- small regime (V empty registers > 0 and raw ≤ 2.5m).
       |  -- Double constants arrive as CAST('…' AS DOUBLE): DuckDB
       |  -- parses a bare decimal literal as DECIMAL first and the
       |  -- DECIMAL→DOUBLE cast is not correctly rounded (the r14 ANN-
       |  -- mirror finding) — one LC-table element came back a ULP off
       |  -- at sf0.001; the string→double parse IS correctly rounded.
       |  SELECT g0, nonzero_registers,
       |    present_sum + ($M - nonzero_registers) *
       |      CAST(${1L << MaxRank} AS BIGINT) AS denom_scaled,
       |    CASE WHEN nonzero_registers < $M
       |           AND CAST('$HllScale' AS DOUBLE) / CAST(present_sum +
       |             ($M - nonzero_registers) *
       |             CAST(${1L << MaxRank} AS BIGINT) AS DOUBLE)
       |             <= CAST('$HllLcGate' AS DOUBLE)
       |         THEN ([${HllLcTable.map(d => s"CAST('$d' AS DOUBLE)")
                          .mkString(", ")}])[$M - nonzero_registers]
       |         ELSE CAST('$HllScale' AS DOUBLE) / CAST(present_sum +
       |           ($M - nonzero_registers) *
       |           CAST(${1L << MaxRank} AS BIGINT) AS DOUBLE) END
       |      AS hll_estimate
       |  FROM per_group
       |)
       |SELECT p.g0 AS $groupCol, $M AS m, p.nonzero_registers,
       |  p.denom_scaled,
       |  e.exact_distinct,
       |  p.hll_estimate,
       |  (p.hll_estimate - CAST(e.exact_distinct AS DOUBLE))
       |    / CAST(e.exact_distinct AS DOUBLE) AS rel_err,
       |  abs((p.hll_estimate - CAST(e.exact_distinct AS DOUBLE))
       |    / CAST(e.exact_distinct AS DOUBLE))
       |    <= CAST('$HllBound' AS DOUBLE) AS within_bound
       |FROM est p JOIN exact e USING (g0)""".stripMargin
  }

  // ─────────────────── KMV (theta) sketch set ops ───────────────────

  /** KMV sample size. k = 256 gives ~1/√k ≈ 6 % relative error on the
    * union scale; intersection error grows as the overlap shrinks (the
    * usual theta-sketch caveat — emitted values let the caller judge).
    */
  val KmvK = 256

  /** Hash domain: the packed 56-bit md5 halves, so the kth-smallest
    * threshold converts to a sampling fraction as hk / 2^56.
    */
  val KmvDomain: Double = math.pow(2.0, 56)

  /** Per-group KMV sketch: the k smallest 56-bit key hashes, plus each
    * group's threshold `hk` (the kth smallest, or 2^56 when the group
    * has fewer than k distinct keys — the degenerate exact regime).
    * Returns (g, h, hk) — one row per retained hash.
    *
    * Scale shape: the `distinct` dominates. At profile scale compose
    * with [[hllDistinct]] the way SketchScale does — a map-only
    * prefilter `h < 2^56·(8k/n̂)` ahead of the distinct cuts the shuffle
    * to ~8k rows per group, and cannot change the result while the kth
    * smallest survivor stays under the gate (every retained hash is
    * below it by construction; assert survivors ≥ k as SketchScale
    * does). The k-selection window then runs on k-scale rows per group,
    * not the key universe.
    */
  def kmvSketch(df: DataFrame, key: Column, group: Column,
      k: Int = KmvK, tag: String = "kmv"): DataFrame = {
    val h = org.apache.spark.sql.graft.GraftExprBridge
      .md5Halves(concat_ws("|", lit(tag), key.cast("string")))
    // null contract (shared with hllDistinct): NULL keys never enter the
    // sketch — concat_ws would otherwise hash them as the bare tag
    val distinctHashes = df.filter(key.isNotNull)
      .select(group.as("g"), h.as("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    distinctHashes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .withColumn("nkept", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .withColumn("hk",
        when(col("nkept") < k, lit(1L << 56))
          .otherwise(max(col("h")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("g")))))
      .select(col("g"), col("h"), col("hk"))
  }

  /** Theta-sketch distinct-set INTERSECTION between every group pair —
    * the set operation HLL registers cannot express. For pair (a, b):
    * θ = min(hk_a, hk_b); the estimate is |{h < θ kept by BOTH}| · 2^56
    * / θ. Exact intersections ride along as the verification column.
    *
    * Determinism: θ and the sample count are integers; the estimate is
    * count·2^56 (exact — count ≤ k needs 8 bits of mantissa) divided by
    * θ's IEEE-rounded double image, both casts round-to-nearest in
    * Spark and DuckDB alike, so the double hash-checks.
    *
    * Output: (g_a, g_b, k, theta, inter_sample, kmv_inter_estimate,
    * exact_inter, rel_err) with g_a < g_b.
    */
  def kmvPairIntersect(df: DataFrame, key: Column, group: Column,
      k: Int = KmvK, tag: String = "kmv"): DataFrame = {
    val sk = kmvSketch(df, key, group, k, tag)
      .transform(graft.util.Pins.pin)
    val a = sk.select(col("g").as("g_a"), col("h"),
      col("hk").as("hk_a"))
    val b = sk.select(col("g").as("g_b"), col("h"),
      col("hk").as("hk_b"))
    // retained sets are ≤ k·|groups| rows — broadcast-scale by design
    val theta = least(col("hk_a"), col("hk_b"))
    val samples = a.join(broadcast(b), "h")
      .filter(col("g_a") < col("g_b") && col("h") < theta)
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("inter_sample"))
    // every pair needs a row even at zero overlap, and every pair needs
    // its θ: cross the per-group thresholds (|groups|² tiny rows)
    val hks = sk.select(col("g"), col("hk")).distinct()
    val pairs = hks.select(col("g").as("g_a"), col("hk").as("hk_a"))
      .join(broadcast(hks.select(col("g").as("g_b"),
        col("hk").as("hk_b"))), col("g_a") < col("g_b"))
    val exact = {
      val d = df.select(group.as("g"), key.as("k0")).distinct()
        .transform(graft.util.Pins.pin)
      d.select(col("g").as("g_a"), col("k0"))
        .join(d.select(col("g").as("g_b"), col("k0")), "k0")
        .filter(col("g_a") < col("g_b"))
        .groupBy(col("g_a"), col("g_b"))
        .agg(count(lit(1)).as("exact_inter"))
    }
    pairs
      .join(samples, Seq("g_a", "g_b"), "left")
      .join(exact, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"), lit(k).as("k"),
        least(col("hk_a"), col("hk_b")).as("theta"),
        coalesce(col("inter_sample"), lit(0L)).as("inter_sample"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
      .withColumn("kmv_inter_estimate",
        col("inter_sample").cast("double") * lit(KmvDomain) /
          col("theta").cast("double"))
      .withColumn("rel_err",
        // null at zero true overlap (ANSI division guard; the mirror's
        // CASE matches)
        when(col("exact_inter") === 0, lit(null).cast("double"))
          .otherwise(
            (col("kmv_inter_estimate") - col("exact_inter").cast("double"))
              / col("exact_inter").cast("double")))
  }

  /** DuckDB mirror of [[kmvPairIntersect]]. */
  def kmvSql(table: String, keyExpr: String, groupCol: String,
      k: Int = KmvK, tag: String = "kmv"): String = {
    val s = s"'$tag' || '|' || CAST($keyExpr AS VARCHAR)"
    val h = s"CAST(('0x' || substr(md5($s), 1, 7)) AS BIGINT) * 268435456" +
      s" + CAST(('0x' || substr(md5($s), 8, 7)) AS BIGINT)"
    s"""WITH dh AS (
       |  SELECT DISTINCT $groupCol AS g, $h AS h FROM $table
       |  WHERE ($keyExpr) IS NOT NULL
       |),
       |ranked AS (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |  FROM dh
       |),
       |kept AS (SELECT g, h FROM ranked WHERE rn <= $k),
       |hks AS (
       |  SELECT g,
       |    CASE WHEN count(*) < $k THEN CAST(${1L << 56} AS BIGINT)
       |         ELSE max(h) END AS hk
       |  FROM kept GROUP BY g
       |),
       |pairs AS (
       |  SELECT a.g AS g_a, b.g AS g_b, a.hk AS hk_a, b.hk AS hk_b
       |  FROM hks a JOIN hks b ON a.g < b.g
       |),
       |samples AS (
       |  SELECT p.g_a, p.g_b, CAST(count(*) AS BIGINT) AS inter_sample
       |  FROM pairs p
       |  JOIN kept ka ON ka.g = p.g_a
       |  JOIN kept kb ON kb.g = p.g_b AND kb.h = ka.h
       |  WHERE ka.h < least(p.hk_a, p.hk_b)
       |  GROUP BY 1, 2
       |),
       |dk AS (SELECT DISTINCT $groupCol AS g, $keyExpr AS k0 FROM $table),
       |exact AS (
       |  SELECT a.g AS g_a, b.g AS g_b, CAST(count(*) AS BIGINT)
       |    AS exact_inter
       |  FROM dk a JOIN dk b ON a.k0 = b.k0 AND a.g < b.g
       |  GROUP BY 1, 2
       |)
       |SELECT p.g_a, p.g_b, $k AS k,
       |  least(p.hk_a, p.hk_b) AS theta,
       |  coalesce(s.inter_sample, 0) AS inter_sample,
       |  coalesce(e.exact_inter, 0) AS exact_inter,
       |  CAST(coalesce(s.inter_sample, 0) AS DOUBLE) * $KmvDomain /
       |    CAST(least(p.hk_a, p.hk_b) AS DOUBLE) AS kmv_inter_estimate,
       |  CASE WHEN coalesce(e.exact_inter, 0) = 0 THEN NULL
       |    ELSE (CAST(coalesce(s.inter_sample, 0) AS DOUBLE) * $KmvDomain /
       |      CAST(least(p.hk_a, p.hk_b) AS DOUBLE)
       |      - CAST(e.exact_inter AS DOUBLE))
       |      / CAST(e.exact_inter AS DOUBLE) END AS rel_err
       |FROM pairs p
       |LEFT JOIN samples s ON s.g_a = p.g_a AND s.g_b = p.g_b
       |LEFT JOIN exact e ON e.g_a = p.g_a AND e.g_b = p.g_b""".stripMargin
  }

  // ──────────────────────── Count-Min sketch ────────────────────────

  /** Depth (independent hash rows) and width (buckets per row). d = 4,
    * w = 32: at the test corpus's 31-word vocabulary the rows collide by
    * construction, so the one-sided overshoot is actually exercised; at
    * production scale w is sized as ⌈e/ε⌉ for the target εN overshoot.
    */
  val CmDepth = 4
  val CmWidth = 32

  /** Bucket of `key` under hash row i: the 28-bit md5 half of
    * "cm|i|key", mod w. Row-indexed tags make the d rows independent
    * draws of one digest family. Native single digest (see
    * [[hllRegisterCols]]); bit-identical to the mirror's hex-cast form.
    */
  def cmBucket(key: Column, i: Int, width: Int = CmWidth): Column =
    shiftrightunsigned(org.apache.spark.sql.graft.GraftExprBridge
      .md5Halves(concat_ws("|", lit("cm"), lit(i), key.cast("string"))),
      28) % width

  /** The d×w counter grid — one exploded corpus pass into a ≤ d·w-cell
    * aggregate. Shared by [[cmHeavyHitters]] and the streaming twin
    * ([[graft.streaming.StreamOps.streamingCmGrid]]), so a streamed grid
    * equals the batch one cell-for-cell and grids merge by `+`
    * (SketchesSpec pins both).
    */
  def cmGrid(keys: DataFrame, keyCol: String,
      width: Int = CmWidth): DataFrame =
    keys
      .filter(col(keyCol).isNotNull) // the sketches' shared null contract
      .select(posexplode(array((0 until CmDepth).map(i =>
        cmBucket(col(keyCol), i, width)): _*)).as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Count-Min heavy hitters over `key`: build the d×w grid in one
    * exploded pass, then probe every candidate key (here: the exact
    * vocabulary — at 100 TB the probe set is whatever candidate stream
    * you care about) with d broadcast lookups and take the min.
    *
    * Output: (key, true_cnt, est_cnt, overcount, is_heavy) — all
    * integers/booleans, hash-exact. `est_cnt ≥ true_cnt` always (the
    * sketch's one-sided guarantee; CmSketchSpec pins it), `is_heavy` is
    * the ≥ 1 % share rule evaluated on the ESTIMATE, i.e. what a
    * production probe would use.
    */
  def cmHeavyHitters(keys: DataFrame, keyCol: String,
      width: Int = CmWidth): DataFrame = {
    // the d×w grid: each key row contributes to d (row, bucket) cells —
    // a fixed 4-way explode, then a ≤ d·w-cell aggregate. This is the
    // 100 TB shape: the shuffle payload is the grid, not the keys.
    // PINNED: the d per-row broadcast probes below would each re-run
    // this corpus aggregation otherwise (broadcast exchanges of
    // different filters never unify under ReuseExchange)
    val cells = cmGrid(keys, keyCol, width)
      .transform(graft.util.Pins.pin)
    // candidate probe: exact counts double as the candidate stream and
    // the verification column
    val truth = keys.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("true_cnt"))
    // the 1 %-share denominator: grid row 0 sums to exactly the corpus
    // count — a 1-row aggregate of the pinned w-cell table, NOT an
    // eager count() pass over the corpus (keeps the operator one-scan
    // per table and fully lazy for composition)
    val total = cells.filter(col("row_i") === 0).agg(
      coalesce(sum(col("cnt")), lit(0L)).as("__cm_total"))
    // d broadcast lookups against the ≤ d·w-cell grid, min across rows
    val probed = (0 until CmDepth).foldLeft(
      truth.withColumn("est_cnt", lit(Long.MaxValue))) { (acc, i) =>
      acc.join(broadcast(cells.filter(col("row_i") === i)
          .select(col("bucket"), col("cnt").as(s"c$i"))),
          cmBucket(col("k"), i, width) === col("bucket"), "left")
        .withColumn("est_cnt", least(col("est_cnt"), col(s"c$i")))
        .drop("bucket", s"c$i")
    }
    probed.crossJoin(broadcast(total))
      .select(col("k").as(keyCol), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") >= col("true_cnt")).as("overcount_ok"),
        (col("est_cnt") * lit(100L) >= col("__cm_total")).as("is_heavy"))
  }

  // ─────────────── dyadic Count-Min rank / quantiles ───────────────

  /** Dyadic levels: values clamp to [0, 2^(L−1) − 1] = [0, 65535] and
    * level b holds the counts of nodes `value >> b`; the extra top level
    * (b = 16, one node) closes the decomposition of the full domain.
    */
  val DcmLevels = 17

  /** Clamp ceiling — the sketch's value domain is [0, DcmMax]. */
  val DcmMax: Long = (1L << (DcmLevels - 1)) - 1

  /** Per-level CM grid shape. w = 64 keeps the whole summary at
    * ≤ 17·4·64 = 4352 cells; at test scale low levels collide by
    * construction so the one-sided overcount path is exercised.
    */
  val DcmWidth = 64

  /** Bucket of dyadic node (level, node) under hash row i — the "dcm"
    * tag domain-separates these draws from the flat CM sketch's.
    */
  def dcmBucket(i: Int, level: Column, node: Column,
      width: Int = DcmWidth): Column =
    shiftrightunsigned(org.apache.spark.sql.graft.GraftExprBridge
      .md5Halves(concat_ws("|", lit("dcm"), lit(i), level.cast("string"),
        node.cast("string"))), 28) % width

  /** Values clamped into the sketch's [0, DcmMax] domain as column `x`. */
  def dcmClamp(values: DataFrame, valueCol: String): DataFrame =
    values.select(least(greatest(col(valueCol).cast("long"), lit(0L)),
      lit(DcmMax)).as("x"))

  /** The L-level dyadic CM grid of a clamped value column `x`: (lvl,
    * row_i, bucket, cnt), ≤ L·d·w cells; cells merge by `+` across
    * batches/days (SketchesSpec pins mergeability), the same roll-up
    * contract as [[cmGrid]].
    *
    * DIRECT form: each input row contributes L·d map-side entries into
    * one aggregation — the single-stateful-agg shape the streaming twin
    * needs. Batch callers should prefer [[dcmGridFromCounts]] over a
    * value histogram: the domain bound makes the histogram ≤ 2^(L−1)
    * rows at ANY corpus size, so the L·d explode runs on histogram
    * rows, not corpus rows (measured 5× cheaper at SketchScale's 10M —
    * and the gap grows with n).
    */
  def dcmGrid(clamped: DataFrame,
      width: Int = DcmWidth): DataFrame =
    clamped
      .select(posexplode(array((0 until DcmLevels).map(b =>
        shiftright(col("x"), b)): _*)).as(Seq("lvl", "node")))
      .select(col("lvl"),
        posexplode(array((0 until CmDepth).map(i =>
          dcmBucket(i, col("lvl"), col("node"), width)): _*))
          .as(Seq("row_i", "bucket")))
      .groupBy(col("lvl"), col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** [[dcmGrid]] from a value HISTOGRAM (x, vcnt) — cell-for-cell equal
    * to the direct form (SketchesSpec pins it) at a fraction of the
    * cost: the corpus pays one map-side-combined count over ≤ 2^(L−1)
    * distinct clamped values, and the L·d explode weights histogram
    * rows by `vcnt`.
    */
  def dcmGridFromCounts(hist: DataFrame,
      width: Int = DcmWidth): DataFrame =
    hist
      .select(col("vcnt"), posexplode(array((0 until DcmLevels).map(b =>
        shiftright(col("x"), b)): _*)).as(Seq("lvl", "node")))
      .select(col("vcnt"), col("lvl"),
        posexplode(array((0 until CmDepth).map(i =>
          dcmBucket(i, col("lvl"), col("node"), width)): _*))
          .as(Seq("row_i", "bucket")))
      .groupBy(col("lvl"), col("row_i"), col("bucket"))
      .agg(sum(col("vcnt")).as("cnt"))

  /** Quantile estimation from a dyadic Count-Min summary — the
    * bounded-state path to percentiles at corpus scale (Cormode &
    * Muthukrishnan 2005 §4.2: a CM sketch per dyadic level; any prefix
    * range [0, x] is ≤ L dyadic nodes, so rank(x) is a sum of ≤ L
    * one-sided node estimates and the φ-quantile is the smallest x whose
    * estimated rank crosses ⌈φN⌉).
    *
    * Scale shape:
    *  - the shuffle payload is the L·d·w ≤ 4352-cell grid (counters
    *    merged by `+` — partial aggregation and multi-day roll-ups are
    *    free), NEVER the value distribution; each input row contributes
    *    L·d constant map-side entries;
    *  - the probe side is domain-bounded: candidates are the ≤ 2^(L−1)
    *    distinct clamped values, so the rank table — and the single-
    *    partition cumulative window it needs — is O(domain), not
    *    O(corpus), by construction;
    *  - probes are d broadcast lookups of the pinned grid, exactly the
    *    [[cmHeavyHitters]] shape.
    *
    * Determinism: counters, ranks and targets are integers throughout —
    * the ⌈φN⌉ target is ppm integer arithmetic ((N·φppm + 999999) div
    * 10⁶, the md5-coin convention), and `rel_err` is one division of
    * exactly-representable casts — so every column hash-checks against
    * the DuckDB replay ([[dyadicCmSql]]).
    *
    * One-sided guarantee: each node estimate ≥ its true count, so
    * est_rank(x) ≥ true_rank(x) pointwise and the estimated quantile can
    * only come EARLY (`q_est ≤ q_exact` — emitted as the checked
    * `est_le_exact` column; SketchesSpec pins the pointwise form).
    *
    * Output: one row per φ — (phi_ppm, n_total, target_rank, q_est,
    * q_exact, est_le_exact, rel_err). `q_exact` is the verification
    * column a production profile would drop.
    */
  def dyadicCmQuantiles(values: DataFrame, valueCol: String,
      phisPpm: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L,
        990000L), width: Int = DcmWidth): DataFrame = {
    import graft.util.Pins
    // ONE corpus pass: the value histogram (≤ 2^(L−1) rows by the
    // domain clamp) feeds the grid, the candidate set AND the exact
    // ranks — pin it once
    val hist = dcmClamp(values, valueCol)
      .groupBy(col("x")).agg(count(lit(1)).as("vcnt"))
      .transform(Pins.pin(_))
    val cells = dcmGridFromCounts(hist, width)
      // PINNED: consumed by d broadcast probes + the total (broadcast
      // exchanges of different filters never unify under ReuseExchange)
      .transform(Pins.pin(_))
    // N: level-0 row-0 cells sum to the corpus count — a 1-row aggregate
    // of the pinned grid, not an extra corpus pass
    val total = cells.filter(col("lvl") === 0 && col("row_i") === 0)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_total"))
    // prefix decomposition: [0, x] = ⋃ over set bits b of (x+1) of the
    // level-b node ((x+1) >> b) − 1 — at most one node per level
    val cand = hist.select(col("x"))
    val probes = cand.select(col("x"),
        explode(array((0 until DcmLevels).map { b =>
          struct(lit(b).as("lvl"),
            (shiftright(col("x") + lit(1L), b) - lit(1L)).as("node"),
            ((shiftright(col("x") + lit(1L), b) % 2) === 1).as("on"))
        }: _*)).as("p"))
      .filter(col("p.on"))
      .select(col("x"), col("p.lvl").as("lvl"), col("p.node").as("node"))
    // d broadcast lookups per node, min across rows; an absent cell is a
    // true zero (no key hashed there), hence coalesce BEFORE least
    val probed = (0 until CmDepth).foldLeft(
      probes.withColumn("est_b", lit(Long.MaxValue))) { (acc, i) =>
      acc.join(broadcast(cells.filter(col("row_i") === i)
          .select(col("lvl").as("c_lvl"), col("bucket"),
            col("cnt").as(s"c$i"))),
          col("lvl") === col("c_lvl") &&
            dcmBucket(i, col("lvl"), col("node"), width) === col("bucket"),
          "left")
        .withColumn("est_b", least(col("est_b"),
          coalesce(col(s"c$i"), lit(0L))))
        .drop("c_lvl", "bucket", s"c$i")
    }
    val estRank = probed.groupBy(col("x"))
      .agg(sum(col("est_b")).as("est_rank"))
    // exact rank: cumulative counts over the ≤ 2^(L−1)-row distinct-value
    // table — single-partition by design because the DOMAIN bounds it,
    // not the corpus (contrast q77, where the ranked set is corpus-sized
    // and gets the distributed range-partition rank)
    val trueRank = hist.withColumn("true_rank",
      sum(col("vcnt")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("x")))).drop("vcnt")
    val ranks = estRank.join(trueRank, "x")
    val phis = values.sparkSession.range(1)
      .select(explode(array(phisPpm.map(lit): _*)).as("phi_ppm"))
    val targets = phis.crossJoin(broadcast(total))
      .withColumn("target_rank",
        expr("(n_total * phi_ppm + 999999) div 1000000"))
    ranks.crossJoin(broadcast(targets))
      .groupBy(col("phi_ppm"), col("n_total"), col("target_rank"))
      .agg(min(when(col("est_rank") >= col("target_rank"), col("x")))
          .as("q_est"),
        min(when(col("true_rank") >= col("target_rank"), col("x")))
          .as("q_exact"))
      .select(col("phi_ppm"), col("n_total"), col("target_rank"),
        col("q_est"), col("q_exact"),
        (col("q_est") <= col("q_exact")).as("est_le_exact"),
        when(col("q_exact") === 0, lit(null).cast("double"))
          .otherwise((col("q_est") - col("q_exact")).cast("double") /
            col("q_exact").cast("double")).as("rel_err"))
  }

  /** Per-GROUP [[dyadicCmQuantiles]] — one dyadic grid per group, the
    * production profile shape ("token-length percentiles per source /
    * language"). Same determinism and one-sided contract; the summary
    * is ≤ G·L·d·w cells and every per-group structure (histogram,
    * candidates, rank window) stays domain-bounded. The rank window
    * partitions by group (distributed), and the grid probes stay d
    * broadcast joins keyed (g, lvl, bucket).
    *
    * Output: one row per (group, φ) — (g, phi_ppm, n_total,
    * target_rank, q_est, q_exact, est_le_exact, rel_err).
    */
  def dyadicCmQuantilesByGroup(values: DataFrame, valueCol: String,
      groupCol: String,
      phisPpm: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L,
        990000L), width: Int = DcmWidth): DataFrame = {
    import graft.util.Pins
    val hist = values
      .select(col(groupCol).as("g"),
        least(greatest(col(valueCol).cast("long"), lit(0L)),
          lit(DcmMax)).as("x"))
      .groupBy(col("g"), col("x")).agg(count(lit(1)).as("vcnt"))
      .transform(Pins.pin(_))
    val cells = hist
      .select(col("g"), col("vcnt"),
        posexplode(array((0 until DcmLevels).map(b =>
          shiftright(col("x"), b)): _*)).as(Seq("lvl", "node")))
      .select(col("g"), col("vcnt"), col("lvl"),
        posexplode(array((0 until CmDepth).map(i =>
          dcmBucket(i, col("lvl"), col("node"), width)): _*))
          .as(Seq("row_i", "bucket")))
      .groupBy(col("g"), col("lvl"), col("row_i"), col("bucket"))
      .agg(sum(col("vcnt")).as("cnt"))
      .transform(Pins.pin(_))
    val totals = cells.filter(col("lvl") === 0 && col("row_i") === 0)
      .groupBy(col("g")).agg(sum(col("cnt")).as("n_total"))
    val probes = hist.select(col("g"), col("x"))
      .select(col("g"), col("x"),
        explode(array((0 until DcmLevels).map { b =>
          struct(lit(b).as("lvl"),
            (shiftright(col("x") + lit(1L), b) - lit(1L)).as("node"),
            ((shiftright(col("x") + lit(1L), b) % 2) === 1).as("on"))
        }: _*)).as("p"))
      .filter(col("p.on"))
      .select(col("g"), col("x"), col("p.lvl").as("lvl"),
        col("p.node").as("node"))
    val probed = (0 until CmDepth).foldLeft(
      probes.withColumn("est_b", lit(Long.MaxValue))) { (acc, i) =>
      acc.join(broadcast(cells.filter(col("row_i") === i)
          .select(col("g").as("c_g"), col("lvl").as("c_lvl"),
            col("bucket"), col("cnt").as(s"c$i"))),
          col("g") === col("c_g") && col("lvl") === col("c_lvl") &&
            dcmBucket(i, col("lvl"), col("node"), width) === col("bucket"),
          "left")
        .withColumn("est_b", least(col("est_b"),
          coalesce(col(s"c$i"), lit(0L))))
        .drop("c_g", "c_lvl", "bucket", s"c$i")
    }
    val estRank = probed.groupBy(col("g"), col("x"))
      .agg(sum(col("est_b")).as("est_rank"))
    val trueRank = hist.withColumn("true_rank",
      sum(col("vcnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("x")))).drop("vcnt")
    val ranks = estRank.join(trueRank, Seq("g", "x"))
    val phis = values.sparkSession.range(1)
      .select(explode(array(phisPpm.map(lit): _*)).as("phi_ppm"))
    val targets = totals.crossJoin(broadcast(phis))
      .withColumn("target_rank",
        expr("(n_total * phi_ppm + 999999) div 1000000"))
    ranks.join(broadcast(targets), "g")
      .groupBy(col("g"), col("phi_ppm"), col("n_total"),
        col("target_rank"))
      .agg(min(when(col("est_rank") >= col("target_rank"), col("x")))
          .as("q_est"),
        min(when(col("true_rank") >= col("target_rank"), col("x")))
          .as("q_exact"))
      .select(col("g"), col("phi_ppm"), col("n_total"),
        col("target_rank"), col("q_est"), col("q_exact"),
        (col("q_est") <= col("q_exact")).as("est_le_exact"),
        when(col("q_exact") === 0, lit(null).cast("double"))
          .otherwise((col("q_est") - col("q_exact")).cast("double") /
            col("q_exact").cast("double")).as("rel_err"))
  }

  /** DuckDB mirror of [[dyadicCmQuantilesByGroup]]. */
  def dyadicCmGroupedSql(table: String, valueExpr: String,
      groupExpr: String,
      phisPpm: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L,
        990000L), width: Int = DcmWidth): String = {
    val lvlValues = (0 until DcmLevels).map(b => s"($b)").mkString(", ")
    val rowValues = (0 until CmDepth).map(i => s"($i)").mkString(", ")
    val phiValues = phisPpm.map(p => s"(CAST($p AS BIGINT))")
      .mkString(", ")
    s"""WITH v AS (
       |  SELECT $groupExpr AS g,
       |    least(greatest(CAST($valueExpr AS BIGINT), 0), $DcmMax) AS x
       |  FROM $table
       |),
       |hist AS (
       |  SELECT g, x, CAST(count(*) AS BIGINT) AS vcnt FROM v
       |  GROUP BY 1, 2
       |),
       |lvls(b) AS (VALUES $lvlValues),
       |rws(i) AS (VALUES $rowValues),
       |cells AS (
       |  SELECT h.g, l.b AS lvl, r.i AS row_i,
       |    CAST(('0x' || substr(md5('dcm' || '|' || r.i || '|' ||
       |      CAST(l.b AS VARCHAR) || '|' || CAST((h.x >> l.b) AS VARCHAR)),
       |      1, 7)) AS BIGINT) % $width AS bucket,
       |    CAST(sum(h.vcnt) AS BIGINT) AS cnt
       |  FROM hist h, lvls l, rws r
       |  GROUP BY 1, 2, 3, 4
       |),
       |totals AS (
       |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n_total
       |  FROM cells WHERE lvl = 0 AND row_i = 0 GROUP BY 1
       |),
       |probes AS (
       |  SELECT h.g, h.x, l.b AS lvl, ((h.x + 1) >> l.b) - 1 AS node
       |  FROM hist h, lvls l
       |  WHERE ((h.x + 1) >> l.b) % 2 = 1
       |),
       |probe_rows AS (
       |  SELECT p.g, p.x, p.lvl, r.i AS row_i,
       |    coalesce(ce.cnt, 0) AS cnt
       |  FROM probes p
       |  CROSS JOIN rws r
       |  LEFT JOIN cells ce ON ce.g = p.g AND ce.lvl = p.lvl
       |    AND ce.row_i = r.i
       |    AND ce.bucket = CAST(('0x' || substr(md5('dcm' || '|' || r.i ||
       |      '|' || CAST(p.lvl AS VARCHAR) || '|' ||
       |      CAST(p.node AS VARCHAR)), 1, 7)) AS BIGINT) % $width
       |),
       |node_est AS (
       |  SELECT g, x, lvl, min(cnt) AS est_b FROM probe_rows
       |  GROUP BY 1, 2, 3
       |),
       |est_rank AS (
       |  SELECT g, x, CAST(sum(est_b) AS BIGINT) AS est_rank
       |  FROM node_est GROUP BY 1, 2
       |),
       |true_rank AS (
       |  SELECT g, x,
       |    CAST(sum(vcnt) OVER (PARTITION BY g ORDER BY x) AS BIGINT)
       |      AS true_rank
       |  FROM hist
       |),
       |ranks AS (
       |  SELECT e.g, e.x, e.est_rank, t.true_rank
       |  FROM est_rank e JOIN true_rank t ON t.g = e.g AND t.x = e.x
       |),
       |phis(phi_ppm) AS (VALUES $phiValues),
       |targets AS (
       |  SELECT t.g, p.phi_ppm, t.n_total,
       |    (t.n_total * p.phi_ppm + 999999) // 1000000 AS target_rank
       |  FROM totals t CROSS JOIN phis p
       |),
       |agg AS (
       |  SELECT t.g, t.phi_ppm, t.n_total, t.target_rank,
       |    min(CASE WHEN r.est_rank >= t.target_rank THEN r.x END)
       |      AS q_est,
       |    min(CASE WHEN r.true_rank >= t.target_rank THEN r.x END)
       |      AS q_exact
       |  FROM ranks r JOIN targets t ON t.g = r.g
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT g, phi_ppm, n_total, target_rank, q_est, q_exact,
       |  q_est <= q_exact AS est_le_exact,
       |  CASE WHEN q_exact = 0 THEN NULL
       |    ELSE CAST(q_est - q_exact AS DOUBLE) / CAST(q_exact AS DOUBLE)
       |  END AS rel_err
       |FROM agg""".stripMargin
  }

  /** DuckDB mirror of [[dyadicCmQuantiles]]: rebuilds the identical
    * grid (same md5 buckets), prefix decomposition, integer targets and
    * single-division `rel_err`.
    */
  def dyadicCmSql(table: String, valueExpr: String,
      phisPpm: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L,
        990000L), width: Int = DcmWidth): String = {
    val lvlValues = (0 until DcmLevels).map(b => s"($b)").mkString(", ")
    val rowValues = (0 until CmDepth).map(i => s"($i)").mkString(", ")
    val phiValues = phisPpm.map(p => s"(CAST($p AS BIGINT))")
      .mkString(", ")
    s"""WITH v AS (
       |  SELECT least(greatest(CAST($valueExpr AS BIGINT), 0), $DcmMax)
       |    AS x
       |  FROM $table
       |),
       |lvls(b) AS (VALUES $lvlValues),
       |rws(i) AS (VALUES $rowValues),
       |cells AS (
       |  SELECT l.b AS lvl, r.i AS row_i,
       |    CAST(('0x' || substr(md5('dcm' || '|' || r.i || '|' ||
       |      CAST(l.b AS VARCHAR) || '|' || CAST((v.x >> l.b) AS VARCHAR)),
       |      1, 7)) AS BIGINT) % $width AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM v, lvls l, rws r
       |  GROUP BY 1, 2, 3
       |),
       |total AS (
       |  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_total
       |  FROM cells WHERE lvl = 0 AND row_i = 0
       |),
       |cand AS (SELECT DISTINCT x FROM v),
       |probes AS (
       |  SELECT c.x, l.b AS lvl, ((c.x + 1) >> l.b) - 1 AS node
       |  FROM cand c, lvls l
       |  WHERE ((c.x + 1) >> l.b) % 2 = 1
       |),
       |probe_rows AS (
       |  SELECT p.x, p.lvl, r.i AS row_i,
       |    coalesce(ce.cnt, 0) AS cnt
       |  FROM probes p
       |  CROSS JOIN rws r
       |  LEFT JOIN cells ce ON ce.lvl = p.lvl AND ce.row_i = r.i
       |    AND ce.bucket = CAST(('0x' || substr(md5('dcm' || '|' || r.i ||
       |      '|' || CAST(p.lvl AS VARCHAR) || '|' ||
       |      CAST(p.node AS VARCHAR)), 1, 7)) AS BIGINT) % $width
       |),
       |node_est AS (
       |  SELECT x, lvl, min(cnt) AS est_b FROM probe_rows GROUP BY 1, 2
       |),
       |est_rank AS (
       |  SELECT x, CAST(sum(est_b) AS BIGINT) AS est_rank FROM node_est
       |  GROUP BY 1
       |),
       |true_rank AS (
       |  SELECT x, CAST(sum(cnt0) OVER (ORDER BY x) AS BIGINT)
       |    AS true_rank
       |  FROM (SELECT x, count(*) AS cnt0 FROM v GROUP BY 1)
       |),
       |ranks AS (
       |  SELECT e.x, e.est_rank, t.true_rank
       |  FROM est_rank e JOIN true_rank t USING (x)
       |),
       |phis(phi_ppm) AS (VALUES $phiValues),
       |targets AS (
       |  SELECT p.phi_ppm, t.n_total,
       |    (t.n_total * p.phi_ppm + 999999) // 1000000 AS target_rank
       |  FROM phis p CROSS JOIN total t
       |),
       |agg AS (
       |  SELECT t.phi_ppm, t.n_total, t.target_rank,
       |    min(CASE WHEN r.est_rank >= t.target_rank THEN r.x END)
       |      AS q_est,
       |    min(CASE WHEN r.true_rank >= t.target_rank THEN r.x END)
       |      AS q_exact
       |  FROM ranks r CROSS JOIN targets t
       |  GROUP BY 1, 2, 3
       |)
       |SELECT phi_ppm, n_total, target_rank, q_est, q_exact,
       |  q_est <= q_exact AS est_le_exact,
       |  CASE WHEN q_exact = 0 THEN NULL
       |    ELSE CAST(q_est - q_exact AS DOUBLE) / CAST(q_exact AS DOUBLE)
       |  END AS rel_err
       |FROM agg""".stripMargin
  }

  /** DuckDB mirror of [[cmHeavyHitters]] over `documents` words. */
  def cmSql(wordPattern: String): String = {
    val buckets = (0 until CmDepth).map(i =>
      s"CAST(('0x' || substr(md5('cm' || '|' || $i || '|' || word), 1, 7)) AS BIGINT) % $CmWidth")
    s"""WITH w AS (
       |  SELECT word FROM (
       |    SELECT unnest(string_split_regex(text, '\\s+')) AS word
       |    FROM documents)
       |  WHERE regexp_matches(word, '$wordPattern')
       |),
       |cells AS (
       |  SELECT row_i, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (
       |    ${(0 until CmDepth).map(i =>
        s"SELECT $i AS row_i, ${buckets(i)} AS bucket FROM w")
        .mkString("\n    UNION ALL ")}
       |  ) GROUP BY 1, 2
       |),
       |truth AS (
       |  SELECT word AS k, CAST(count(*) AS BIGINT) AS true_cnt FROM w
       |  GROUP BY 1
       |),
       |total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w)
       |SELECT t.k AS word, t.true_cnt,
       |  least(${(0 until CmDepth).map(i =>
        s"(SELECT cnt FROM cells WHERE row_i = $i AND bucket = " +
          s"${buckets(i).replace("word", "t.k")})").mkString(", ")})
       |    AS est_cnt,
       |  least(${(0 until CmDepth).map(i =>
        s"(SELECT cnt FROM cells WHERE row_i = $i AND bucket = " +
          s"${buckets(i).replace("word", "t.k")})").mkString(", ")})
       |    >= t.true_cnt AS overcount_ok,
       |  least(${(0 until CmDepth).map(i =>
        s"(SELECT cnt FROM cells WHERE row_i = $i AND bucket = " +
          s"${buckets(i).replace("word", "t.k")})").mkString(", ")})
       |    * 100 >= (SELECT n FROM total) AS is_heavy
       |FROM truth t""".stripMargin
  }
}
