package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ml.{IForest, PowerDirection}
import graft.ops.{Features, Scoring, Windows}

/** AA-AR: Attention Routing over a time-evolving transaction graph
  * (reference pipeline `/root/reference/AA-AR.py:223-267`, SURVEY §3.1).
  *
  * Stages, re-expressed Spark-first:
  *   1. focus plots  — sliding windows (W1) → 12 features/account (A1-A8)
  *                     → per (window, feature-pair) isolation-forest scores
  *                     (M3) in one `flatMapGroups` pass;
  *   2. sketching    — deterministic hash-sampling of (account, pair) cells
  *                     (P8), greedy column pick (M5), sketch vectors (A11)
  *                     as one join + keyed aggregation;
  *   3. change score — trailing window frame (W2) → local SVD direction
  *                     (M1) → cosine distance (M2) per window.
  *
  * The reference runs one joblib fork per window over the whole edge frame
  * (`AA-AR.py:111-115`); here the window id is a column, so Spark
  * parallelizes over (window × pair) groups — thousands of independent
  * tasks at 100 TB instead of n_jobs=4.
  */
object AaAr {

  val FN = 12 // feature count → FN*(FN+1)/2 would match `pn`, but only
  // the 66 strict upper-triangle pairs are ever filled (AA-AR.py:76-77);
  // we enumerate exactly those (SURVEY §7.4 quirk: pn=78 allocated, 66 used)
  val pairs: Seq[(Int, Int, Int)] = {
    var num = -1
    for (f1 <- 0 until FN; f2 <- (f1 + 1) until FN) yield {
      num += 1; (num, f1, f2)
    }
  }

  /** Per-(window, pair) isolation-forest anomaly scores on
    * (log10(f1+1), log10(f2+1)) over accounts with both features non-zero
    * (P6 filter + transform of `AA-AR.py:78-89`).
    *
    * Output: (wid, pair_id, account, x, y, score).
    *
    * Oracle portability (round 11): the fit coordinates are
    * `round(log10(f+1), 6)` — quantized BEFORE the forest, by Spark's own
    * `round` expression so the DuckDB mirror's `round(log10(f+1), 6)`
    * holds the bit-identical double (the q85 6-dp idiom). Tree structure
    * is then a pure function of exact inputs and tag-keyed md5 draws
    * (IForest scaladoc), which is what lets q34/q31/q45 regenerate the
    * whole forest level-by-level in SQL. The non-zero filter stays on the
    * RAW feature (a sub-ppm variance is non-zero even when its rounded
    * log collapses to 0), carried through the shuffle as a 12-bit mask.
    */
  def focusScores(featuresByWindow: DataFrame, numTrees: Int = 100,
                  seed: Long = 0L, pairBlocks: Int = 8): DataFrame = {
    val spark = featuresByWindow.sparkSession
    import spark.implicits._

    val fcols = Features.featureCols
    // Shuffle shape: the naive plan melts each (wid, account) row into 66
    // (pair, x, y) rows BEFORE the groupBy — a 66× row blow-up through the
    // exchange (40M rows at sf0.1; at 100 TB the shuffle would dwarf the
    // compute). Instead each feature row is replicated only `pairBlocks`
    // times (one 12-feature array per copy) and each (wid, block) group
    // fits its ~66/pairBlocks forests locally. pairBlocks trades shuffle
    // volume against task granularity: parallelism = windows × pairBlocks
    // tasks — raise it on large clusters, but any value yields identical
    // output (per-pair fits are tag-keyed independently of the blocking).
    val nb = math.max(1, math.min(pairBlocks, pairs.size))
    val lf = array(fcols.map(c =>
      round(log10(col(c).cast("double") + 1.0), 6)): _*)
    val nz = fcols.zipWithIndex.map { case (c, i) =>
      when(col(c).cast("double") =!= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val ds = featuresByWindow.select(
        col("wid"), col("account"), lf.as("f"), nz.as("nz"),
        explode(sequence(lit(0), lit(nb - 1))).as("blk"))
      .as[(Long, Long, Array[Double], Long, Int)]

    ds.groupByKey { case (wid, _, _, _, blk) => (wid, blk) }
      .flatMapGroups {
        (key: (Long, Int),
         rows: Iterator[(Long, Long, Array[Double], Long, Int)]) =>
        val (wid, blk) = key
        // Sorted by account so each fit is DETERMINISTIC under any
        // physical plan / partitioning — group iteration order is not
        // stable across plan changes, and the subsample indices depend on
        // row order. Memory is O(accounts-per-window), same bound as the
        // reference's per-window frame.
        val buf = rows.toArray.sortBy(_._2)
        pairs.iterator
          .filter { case (pid, _, _) => pid % nb == blk }
          .flatMap { case (pid, f1, f2) =>
            // P6 non-zero filter (raw-feature mask) + quantized log coords
            val kept = buf.iterator
              .filter { case (_, _, _, m, _) =>
                ((m >> f1) & 1L) == 1L && ((m >> f2) & 1L) == 1L }
              .map { case (_, acct, f, _, _) => (acct, f(f1), f(f2)) }
              .toArray
            val pts = kept.map { case (_, x, y) => Array(x, y) }
            val forest = IForest.fit(pts, numTrees, 256,
              tag = s"if|$seed|$wid|$pid")
            val scores = forest.scoreAll(pts)
            kept.iterator.zipWithIndex.map {
              case ((acct, x, y), i) => (wid, pid, acct, x, y, scores(i))
            }
          }
      }
      .toDF("wid", "pair_id", "account", "x", "y", "score")
  }

  /** ppm keep threshold for a (1−rate) keep probability — `math.round` so
    * (1−0.995)·10⁶ = 5000 exactly despite the binary representation of
    * 0.005; the SQL mirror embeds the SAME integer.
    */
  private[graft] def keepPpm(rate: Double): Long =
    math.round((1.0 - rate) * 1000000.0)

  /** All (ski, element) pairs where the deterministic md5 ppm coin keeps
    * `element` in sketch `ski`, built by cross-joining the (small,
    * distinct) element set with sketch ids — the element sets here are
    * accounts and the 66 pair ids, both tiny next to the edge table.
    * The coin is the engine-portable single-digest ppm idiom
    * (`('0x' || substr(md5(elem||'|'||ski||'|'||tag), 1, 15)) % 10⁶`), the
    * q53 form — any SQL engine reproduces the selection bit-for-bit.
    */
  private def selBySketch(elems: DataFrame, colName: String, sketchNum: Int,
                          keep: Long, tag: String): DataFrame = {
    val spark = elems.sparkSession
    import spark.implicits._
    val coin = org.apache.spark.sql.graft.GraftExprBridge.md5Ppm(
      concat_ws("|", col(colName), col("ski"), lit(tag)))
    elems.crossJoin(broadcast((0 until sketchNum).toDF("ski")))
      .filter(coin < lit(keep))
      .select(col("ski"), col(colName))
  }

  /** Greedy column pick (M5) for ONE sketch: at each step take the
    * candidate pair maximizing Σ_acct max(s over picked ∪ {c}). Pure local
    * function — each sketch's greedy is independent of every other's, so it
    * runs per-sketch ON EXECUTORS (see [[sketches]]); its input is the
    * sampled cell set for that sketch, bounded by the (1−sRate)·(1−dRate)
    * sampling, not by the corpus.
    *
    * Scores are ppm INTEGERS (see [[sketches]]), so every candidate total
    * is exact under any summation order and the strict-`>` argmax (first
    * max in ascending-pair iteration, i.e. smallest pair id among ties) is
    * engine-portable — the q31/q45 oracles replay the same three unrolled
    * steps in SQL.
    */
  private[graft] def greedyPick(candSorted: Array[Int],
                               cells: Array[(Long, Int, Long)],
                               numDst: Int): Seq[Int] = {
    // account -> (pair -> s)
    val byAcct = cells.groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, rs) => rs.map(r => r._2 -> r._3).toMap }
    val cand = candSorted.toBuffer
    val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
    var continue = true
    var steps = math.min(cand.size, numDst)
    while (steps > 0 && continue) {
      var bestIdx = -1
      var bestS = 0L
      for (c <- cand) {
        val cols = picked :+ c
        var s = 0L
        for (m <- byAcct)
          s += cols.iterator.map(cc => m.getOrElse(cc, 0L)).max
        if (s > bestS) { bestS = s; bestIdx = c }
      }
      // faithful quirk (AA-AR.py:138-146): if no candidate scores > 0 the
      // reference still removes/appends index 0's value; we instead stop —
      // documented divergence: empty-score sketches contribute 0 anyway
      if (bestIdx < 0) continue = false
      else { cand -= bestIdx; picked += bestIdx; steps -= 1 }
    }
    picked.toSeq
  }

  /** The sketch-sum surface (P8 coin + A9 keyed accumulation + A11
    * projection sums + densify) as an oracle-checkable query: per sketch
    * `ski`, keep the accounts whose deterministic coin lands below
    * `keepPpm`/10⁶ and emit Σ of an integer per-(wid, account) score over
    * the kept accounts, densified to every (wid × ski) slot.
    *
    * Differences from the production [[sketches]] stage, both deliberate:
    * the coin is the md5 hex-prefix halve (engine-portable — any SQL
    * engine reproduces the selection bit-for-bit; the production path
    * keeps the faster Spark-native xxhash64), and the scores are BIGINT so
    * the keyed sums are exact under any aggregation order — this is the
    * same pipeline SHAPE with the two sources of engine-dependence
    * removed, which is what lets the driver's DuckDB oracle hash-confirm
    * the operator.
    *
    * `scores` needs (wid, account, s BIGINT).
    */
  def sketchProjection(scores: DataFrame, sketchNum: Int = 64,
                       keepPpm: Long = 20000L,
                       seed: String = "gsk"): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    val skis = broadcast((0 until sketchNum).toDF("ski"))
    // native single-digest ppm coin (Md5PpmExpr) — bit-identical to the
    // conv(substring(md5)) form the q53 oracle mirrors
    val coin = org.apache.spark.sql.graft.GraftExprBridge.md5Ppm(
      concat_ws("|", col("account"), col("ski"), lit(seed)))
    val sel = scores.select(col("account")).distinct()
      .crossJoin(skis).filter(coin < keepPpm)
      .select(col("ski"), col("account"))
    val sums = scores.join(broadcast(sel), "account")
      .groupBy(col("wid"), col("ski"))
      .agg(sum(col("s")).as("v"))
    scores.select(col("wid")).distinct().crossJoin(skis)
      .join(sums, Seq("wid", "ski"), "left")
      .select(col("wid"), col("ski"),
        coalesce(col("v"), lit(0L)).as("value"))
  }

  /** Full sketching stage: returns (wid, ski, value) sketch table.
    *
    * `value` is a ppm INTEGER: each focus score is quantized once
    * (`CAST(round(score·10⁶) AS BIGINT)` — sub-ppm structure is noise at
    * the sketch's own sampling granularity) and every downstream sum —
    * the greedy's candidate totals and the sketch values themselves — is
    * then exact under any aggregation order, engine-portable by
    * construction. The sampling coins are tag-keyed md5 ppm draws.
    */
  def sketches(focus: DataFrame, sketchNum: Int = 256, numDst: Int = 3,
               sRate: Double = 0.995, dRate: Double = 0.8,
               seed: Long = 0L): DataFrame = {
    val spark = focus.sparkSession
    import spark.implicits._

    val srcSel = selBySketch(focus.select(col("account")).distinct(),
      "account", sketchNum, keepPpm(sRate), s"afs$seed")
    val dstCand = selBySketch(focus.select(col("pair_id")).distinct(),
      "pair_id", sketchNum, keepPpm(dRate), s"afd$seed")

    val q = focus.select(col("wid"), col("pair_id"), col("account"),
      round(col("score") * lit(1000000.0), 0).cast("long").as("s"))

    val sumGraph = q.groupBy(col("account"), col("pair_id"))
      .agg(sum(col("s")).as("s"))

    // sampled sub-matrix cells, (ski, account, pair, s), limited to
    // sampled src × candidate dst — NEVER collected: at 10⁹ accounts ×
    // 256 sketches the sampled cell set is itself billions of rows. Each
    // sketch's greedy is independent, so the cells and the candidate list
    // cogroup by ski and the pick runs as one executor task per sketch;
    // per-task memory is the per-sketch sample (sampling-rate bounded),
    // the same bound the greedy's own working set needs anyway.
    val cellRows = srcSel.join(sumGraph, "account")
      .join(dstCand, Seq("ski", "pair_id"))
      .select(col("ski"), col("account"), col("pair_id"), col("s"))
      .as[(Int, Long, Int, Long)]
    val chosen = dstCand.as[(Int, Int)].groupByKey(_._1)
      .cogroup(cellRows.groupByKey(_._1)) { (ski, cs, rs) =>
        val cand = cs.map(_._2).toArray.sorted
        val cells = rs.map(r => (r._2, r._3, r._4)).toArray
        greedyPick(cand, cells, numDst).iterator.map(p => (ski, p))
      }

    val chosenDf = broadcast(chosen.toDF("ski", "pair_id"))
    val srcSelB = broadcast(srcSel)

    // sketch value (A11): Σ over selected (account × pair) cells per window
    val sk = q.join(srcSelB, "account")
      .join(chosenDf, Seq("ski", "pair_id"))
      .groupBy(col("wid"), col("ski"))
      .agg(sum(col("s")).as("v"))

    // densify: every (wid, ski) slot, 0 when no selected cell scored
    val wids = focus.select(col("wid")).distinct()
    wids.crossJoin(broadcast((0 until sketchNum).toDF("ski")))
      .join(sk, Seq("wid", "ski"), "left")
      .select(col("wid"), col("ski"),
        coalesce(col("v"), lit(0L)).as("value"))
  }

  /** Change-score time series (W2 + M1 + M2, `AA-AR.py:234-241`):
    * per window i ≥ backWs, the cosine distance between the L1-normalized
    * |principal direction| of the trailing sketch frame
    * [i−backWs, i−2] and the L1-normalized current sketch. Also emits the
    * reference's attention coordinate argmax((sk−ev)/ev) (A14).
    */
  def changeScores(sketchTable: DataFrame, backWs: Int = 4): DataFrame = {
    val spark = sketchTable.sparkSession
    import spark.implicits._

    // frames: backWs-1 sketch vectors in chronological frame order =
    // COLUMNS of the reference's S.T — principal direction by the
    // fixed-fold power iteration (PowerDirection scaladoc), the
    // engine-portable twin of `np.linalg.svd(S.T)[0][:,0]` + abs
    val svdUdf = udf { (frames: Seq[Seq[Double]]) =>
      PowerDirection.principalAbs(frames.map(_.toArray).toArray)
    }

    val vecs = sketchTable
      .groupBy(col("wid"))
      .agg(array_sort(collect_list(struct(col("ski"), col("value"))))
        .as("sv"))
      .select(col("wid"),
        transform(col("sv"), s => s.getField("value").cast("double"))
          .as("sketch"))

    // global (un-partitioned) windows are deliberate: rows here are ONE
    // per time window (the sketch table is pre-aggregated), so the single
    // task sees #windows rows — thousands even at 100 TB of edges. The
    // time axis, not the data volume, bounds this stage.
    val w = Window.orderBy(col("wid")).rowsBetween(-backWs, -2)
    val rnW = Window.orderBy(col("wid"))
    val withFrame = vecs
      .withColumn("frame", collect_list(col("sketch")).over(w))
      .withColumn("rn", row_number().over(rnW) - 1)
      .filter(col("rn") >= backWs)
      .withColumn("ev", svdUdf(col("frame")))

    // ANSI-safe divisions: an all-zero sketch (no scored cell selected in
    // any sketch of a window) or a zero ev coordinate would raise
    // DIVIDE_BY_ZERO under Spark 4's default ANSI mode. try_divide → null,
    // and the null-skipping array aggregates treat those coordinates as
    // contributing nothing — the numpy reference emits inf/nan there and
    // never selects them either.
    val l1 = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0.0), (a, x) => a + x)
    withFrame
      .withColumn("evn",
        transform(col("ev"), x => try_divide(x, l1(col("ev")))))
      .withColumn("skn",
        transform(col("sketch"), x => try_divide(x, l1(col("sketch")))))
      .withColumn("change_score",
        coalesce(
          lit(1.0) - try_divide(Scoring.dotProduct(
              transform(col("evn"), x => coalesce(x, lit(0.0))),
              transform(col("skn"), x => coalesce(x, lit(0.0)))),
            Scoring.l2Norm(transform(col("evn"), x => coalesce(x, lit(0.0)))) *
              Scoring.l2Norm(transform(col("skn"), x => coalesce(x, lit(0.0))))),
          lit(0.0)))
      .withColumn("ratio",
        zip_with(col("skn"), col("evn"), (s, e) => try_divide(s - e, e)))
      .withColumn("max_coord",
        coalesce(array_position(col("ratio"), array_max(col("ratio"))) - 1,
          lit(-1L)))
      .select(col("wid"), col("change_score"), col("max_coord"))
  }

  /** Attention routing (`AA-AR.py:252-266`, SURVEY §3.1 final stage):
    * at the most anomalous window (argmax change score, A14), rank the
    * attended feature pairs by total focus score, take the top
    * `numAccounts` accounts of each of the top `numFigures` pairs, and
    * attach each account's mean past position over the previous `back`
    * windows (J3/W4). This IS the data behind the reference's PNG
    * figures — S6 is presentation, the table is the semantics.
    */
  def attentionRouting(focus: DataFrame, changes: DataFrame,
                       numFigures: Int = 3, numAccounts: Int = 3,
                       back: Int = 4): DataFrame = {
    val topWid = changes
      .orderBy(col("change_score").desc, col("wid").asc)
      .select(col("wid")).limit(1)
    // pinned: `f` (the focus rows of ONE window — tiny) feeds both the
    // pair ranking and the account ranking below; without the pin each
    // consumer re-scans the FULL focus table to re-filter it
    val f = graft.util.Pins.pin(focus.join(broadcast(topWid), "wid"))
    val pw = Window.partitionBy(col("wid"))
      .orderBy(col("pair_score").desc, col("pair_id").asc)
    // ONE aggregation pass computes both the pair ranking and each
    // figure's power-law overlay (`AA-AR.py:188-193`): the focus coords
    // are log10(feature+1), an affine rescale of the reference's
    // ln(feature+1) regression variables — slope and R² are invariant
    // under it; the intercept is the same fit in log10 units. Fitting all
    // pairs before the rank filter is ≤66 extra tiny aggregates, cheaper
    // than a second scan of the focus table for just the attended ones.
    val slope = try_divide(covar_pop(col("x"), col("y")),
      var_pop(col("x")))
    val topPairs = f.groupBy(col("wid"), col("pair_id"))
      .agg(sum(col("score")).as("pair_score"),
        slope.as("fit_slope"),
        (avg(col("y")) - slope * avg(col("x"))).as("fit_intercept"),
        (corr(col("x"), col("y")) * corr(col("x"), col("y")))
          .as("fit_r2"))
      .withColumn("prank", row_number().over(pw))
      .filter(col("prank") <= numFigures)
      .select(col("wid"), col("pair_id"), col("prank"), col("fit_slope"),
        col("fit_intercept"), col("fit_r2"))
    val aw = Window.partitionBy(col("wid"), col("pair_id"))
      .orderBy(col("score").desc, col("account").asc)
    val topAcc = f.join(broadcast(topPairs), Seq("wid", "pair_id"))
      .withColumn("rnk", row_number().over(aw))
      .filter(col("rnk") <= numAccounts)
      .select(col("wid"), col("pair_id"), col("prank"), col("rnk"),
        col("account"), col("x"), col("y"), col("fit_slope"),
        col("fit_intercept"), col("fit_r2"))
    val past = focus.select(col("wid").as("pwid"),
      col("pair_id").as("ppair"), col("account").as("pacct"),
      col("x").as("px"), col("y").as("py"))
    broadcast(topAcc).join(past,
        past("ppair") === topAcc("pair_id") &&
          past("pacct") === topAcc("account") &&
          past("pwid") >= topAcc("wid") - back &&
          past("pwid") < topAcc("wid"),
        "left")
      .groupBy(topAcc("wid"), topAcc("pair_id"), col("prank"), col("rnk"),
        topAcc("account"), col("x"), col("y"), col("fit_slope"),
        col("fit_intercept"), col("fit_r2"))
      .agg(avg(col("px")).as("past_x"), avg(col("py")).as("past_y"))
  }

  /** End-to-end: edges → change scores.
    *
    * The focus table feeds the sketch stage at four+ points (account
    * universe, pair universe, sum-graph, per-sketch sums) — without a
    * persist each reference re-runs the whole isolation-forest stage,
    * the most expensive computation in the pipeline. MEMORY_AND_DISK:
    * the table is O(windows × accounts × nonzero pairs) and must spill,
    * not OOM, at scale.
    */
  def run(edges: DataFrame, windowSize: Int = 14, sketchNum: Int = 256,
          backWs: Int = 4, numDst: Int = 3, numTrees: Int = 100,
          seed: Long = 0L): DataFrame = {
    val wedges = Windows.withWindowId(edges, windowSize, windowSize / 2)
    val feats = Features.accountFeaturesByWindow(wedges)
    val focus = focusScores(feats, numTrees, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    runFromFocus(focus, sketchNum, backWs, numDst, seed)
  }

  /** Sketch + change-score stages over a prebuilt (ideally persisted)
    * focus table — lets callers share ONE materialized focus-score
    * computation across several queries: Spark's CacheManager cannot
    * dedup it by plan because every `flatMapGroups` call embeds a fresh
    * closure object, so plan-identical focus tables built twice never
    * cache-hit. Sharing the DataFrame instance is the reliable way.
    */
  def runFromFocus(focus: DataFrame, sketchNum: Int = 256, backWs: Int = 4,
                   numDst: Int = 3, seed: Long = 0L): DataFrame = {
    val sk = sketches(focus, sketchNum, numDst, seed = seed)
    changeScores(sk, backWs)
  }
}
