package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Corpus-scale run record for the round-8 newcomers — the mixture-epoch
  * materialization (q88) and the interval-overlap join (q89) — at 20–2000×
  * the bench scale (dev tool, run manually; results recorded in README,
  * like [[TextScale]]/[[AnnScale]]).
  *
  * Mixture epoch (default 10⁷ docs, 20 sources with a quadratic size
  * skew): runs [[graft.ops.Sampling.mixtureEpoch]] and ASSERTS the three
  * properties that make it a 100 TB operator —
  *  - the static plan is MAP-ONLY on the corpus side: one broadcast
  *    weights join, zero ShuffleExchange between the corpus source and
  *    the emitted manifest (the epoch streams scan → sink);
  *  - token-share conservation: per source, emitted token mass lands on
  *    mix_weight × source tokens within binomial coin noise (< 1 % rel
  *    on every source at this size);
  *  - the manifest is DETERMINISTIC: two independent materializations
  *    agree on row count and on an order-key checksum (the md5 `ord` is
  *    a pure function of (doc, copy), not of run or partitioning).
  *
  * Overlap join (default 10⁷ left intervals × 10⁴ right, planted so the
  * exact answer is closed-form): left i = [10i, 10i+5], right j =
  * [10⁴j, 10⁴j+4995] ⇒ each right interval overlaps EXACTLY 500 left
  * intervals, so the join must return nRight × 500 pairs — each exactly
  * once (the first-shared-bin residual replaces a dedup pass). Also
  * asserts the plan stays equi-on-bin (no cartesian / nested-loop).
  *
  * Prints one JSON line with timings and the asserted stats.
  */
object MixScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nRight = 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    // ───── mixture epoch at n docs ─────
    // quadratic source skew: source 0 holds ~22 % of docs, source 19 ~1 %
    // — the shape that makes mix weights interesting (rare sources hit
    // the cap, the head gets downsampled)
    def uCol(a: Column, c: Double): Column = {
      val s = sin(a * 12.9898 + c * 78.233) * 43758.5453
      s - floor(s)
    }
    val docs = spark.range(n).select(col("id").as("doc_id"),
        floor(pow(uCol(col("id"), 1.0), 2.0) * 20).cast("int")
          .cast("string").as("source"),
        (lit(50L) + pmod(col("id"), lit(150L))).as("n_tokens"))
      .persist()
    docs.count()

    // plan shape: corpus side map-only (the weights side owns the only
    // aggregation shuffles)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = graft.ops.Sampling.mixtureEpoch(docs)
      .queryExecution.executedPlan
    spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == 1, s"expected one broadcast weights join: $plan")
    val streamed = bhj.head.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.head.left
      case _ => bhj.head.right
    }
    val streamedShuffles =
      streamed.collect { case s: ShuffleExchangeExec => s }
    assert(streamedShuffles.isEmpty,
      s"corpus side of the epoch join shuffles: $streamedShuffles")

    // materialize twice; checksum = (rows, Σ 28-bit ord prefix)
    def epochChecksum(): (Long, Long, Double) = {
      val t = t0()
      val r = graft.ops.Sampling.mixtureEpoch(docs)
        .agg(count(lit(1)),
          sum(conv(substring(col("ord"), 1, 7), 16, 10).cast("long")))
        .as[(Long, Long)].first()
      (r._1, r._2, secs(t))
    }
    val (rows1, sum1, epochSec1) = epochChecksum()
    val (rows2, sum2, epochSec2) = epochChecksum()
    assert(rows1 == rows2 && sum1 == sum2,
      s"epoch manifest not deterministic: ($rows1,$sum1) vs ($rows2,$sum2)")

    // token-share conservation: emitted mass per source vs w × mass
    val w = graft.ext.TextOps.sourceMixWeights(docs)
      .select(col("source"), col("mix_weight"), col("n_tokens"))
    val emitted = graft.ops.Sampling.mixtureEpoch(docs)
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("emitted"))
    val conserv = emitted.join(w, "source")
      .select(abs(col("emitted") -
          col("mix_weight") * col("n_tokens")).cast("double") /
        (col("mix_weight") * col("n_tokens")))
      .as[Double].collect()
    val maxRelErr = conserv.max
    assert(maxRelErr < 0.01,
      s"token-share conservation broke: max rel err $maxRelErr")

    // ───── overlap join at n left intervals ─────
    val left = spark.range(n).select(col("id").as("lid"),
      (col("id") * 10L).cast("double").as("l0"),
      (col("id") * 10L + 5L).cast("double").as("l1"))
    val right = spark.range(nRight).select(col("id").as("rid"),
      (col("id") * 10000L).cast("double").as("r0"),
      (col("id") * 10000L + 4995L).cast("double").as("r1"))
    val ovl = graft.ops.Relational.overlapJoin(
      left, "l0", "l1", right, "r0", "r1", bucketSeconds = 100L)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ovlPlan = ovl.queryExecution.executedPlan
    spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(ovlPlan.collect { case c: CartesianProductExec => c }.isEmpty &&
      ovlPlan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"overlap join lost its equi-on-bin shape: $ovlPlan")
    val tOvl = t0()
    val nPairs = ovl.count()
    val ovlSec = secs(tOvl)
    val expected = nRight * 500L
    assert(nPairs == expected,
      s"overlap join returned $nPairs pairs, expected exactly $expected")

    println(s"""{"n_docs":$n,"epoch_rows":$rows1,""" +
      s""""epoch_sec_first":$epochSec1,"epoch_sec_second":$epochSec2,""" +
      s""""max_token_share_rel_err":$maxRelErr,""" +
      s""""n_left":$n,"n_right":$nRight,"overlap_pairs":$nPairs,""" +
      s""""overlap_sec":$ovlSec}""")
    spark.stop()
  }
}
