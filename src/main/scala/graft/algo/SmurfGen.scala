package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Seeded smurf-pattern injector — the labeled-evaluation-data generator
  * (reference `/root/reference/smurf_generator.py:12-67`, SURVEY §3.3).
  *
  * Semantics: starting from a base directed edge set, for each fold plant
  * one smurf star (src → each of `middleNum` random intermediaries → dst)
  * plus 1–5 noise stars whose intermediaries also interact with
  * probability depending on a per-star random radius (`smurf_generator
  * .py:24-37`). Output is the long-form parquet remodel of the reference's
  * pickle (SURVEY S5): edges + labels per (middle_num, fold).
  *
  * The fold construction is a driver-side seeded program (the reference's
  * choices are a few thousand RNG draws); the OUTPUT is distributed
  * DataFrames. The base edge set and account universes come from
  * distributed queries.
  */
object SmurfGen {

  final case class Fold(middleNum: Int, fold: Int,
                        edges: Set[(Long, Long)], label: (Long, Long))

  /** 28-bit uniform draw keyed by `tag` — the exact value
    * `CAST(('0x' || substr(md5(tag), 1, 7)) AS BIGINT)` yields in any SQL
    * engine (the q23/q58 md5 idiom, here on the driver; shared with the
    * derandomized isolation forest via [[graft.util.PortableHash]]).
    */
  def h28(tag: String): Long = graft.util.PortableHash.h28(tag)

  /** Port of generate_eval_df (`smurf_generator.py:12-40`), deterministic
    * under `seed`. The reference's sequential numpy RNG is replaced by
    * INDEPENDENT tag-keyed md5 draws — `arr[h28(tag) % len]` per choice,
    * one tag per (fold, role, index) — because the reference's eval design
    * only needs *a* seeded deterministic draw (parity with numpy's exact
    * stream is impossible and not required; SURVEY §5 asserts recall, not
    * RNG equality), and tag-keyed hashing is reproducible OUTSIDE the JVM:
    * the q33/q38/q39 oracles regenerate the identical folds in DuckDB from
    * the same md5 arithmetic, which puts the whole generator — stars,
    * noise stars, intermediary interactions — under the hash gate rather
    * than rows-only.
    */
  def generateFolds(base: Set[(Long, Long)], bankAcc: Array[Long],
                    clientAcc: Array[Long], middleNum: Int, folds: Int = 10,
                    seed: Long = 0L): Seq[Fold] = {
    def pick(arr: Array[Long], tag: String): Long =
      arr((h28(tag) % arr.length).toInt)
    (0 until folds).map { f =>
      val t = s"sg|$seed|$middleNum|$f"
      val src = pick(clientAcc, s"$t|s")
      val dst = pick(clientAcc, s"$t|d")
      val middles = (0 until middleNum).map(i => pick(bankAcc, s"$t|m|$i"))
      val el = mutable.Set.empty[(Long, Long)] ++ base
      middles.foreach { m => el += ((src, m)); el += ((m, dst)) }
      val noiseNum = 1 + (h28(s"$t|nn") % 5).toInt
      (0 until noiseNum).foreach { j =>
        val r = (h28(s"$t|n|$j|r") % 11).toInt
        val mnj = math.max(middleNum + (5 - r), 0)
        val others = clientAcc.filter(ca => ca != src && ca != dst)
        val nSrc = pick(others, s"$t|n|$j|s")
        val nDst = pick(others, s"$t|n|$j|d")
        val nMiddle = (0 until mnj).map(i => pick(bankAcc, s"$t|n|$j|m|$i"))
        nMiddle.foreach { mcc => el += ((nSrc, mcc)); el += ((mcc, nDst)) }
        for (a <- 0 until mnj; b <- 0 until mnj if a != b)
          // interaction between intermediaries (smurf_generator.py:34-37):
          // coin keyed by the index pair, value-distinct middles only
          if (nMiddle(a) != nMiddle(b) &&
              (1 + (h28(s"$t|n|$j|x|$a|$b") % 10)).toDouble > r / 2.5 + 6.0)
            el += ((nMiddle(a), nMiddle(b)))
      }
      Fold(middleNum, f, el.toSet, (src, dst))
    }
  }

  /** Deterministic background noise among bank accounts
    * (`smurf_generator.py:57-60`): every ordered (src, dst) bank pair is
    * kept with probability 1−interactProb by an engine-portable md5 coin
    * (the same idiom as `AaAr.sketchProjection` — any SQL engine
    * reproduces the exact edge set; see the q58 oracle). Evaluated inside
    * the (bank × bank) crossJoin on executors, so the same seed yields
    * the same background on any cluster layout. `banks` needs one column
    * `b`.
    */
  /** Keep-probability as an integer ppm threshold. Rounds rather than
    * truncates: 1.0-0.9995 = 4.999…e-4 in double, and a toLong truncation
    * would give 499 while the q58 oracle (and the documented contract)
    * uses ppm < 500 — the threshold must be the same integer in both
    * engines.
    */
  def ppmThreshold(interactProb: Double): Long =
    math.round((1.0 - interactProb) * 1000000L)

  def backgroundEdges(banks: DataFrame, interactProb: Double = 0.9995,
                      seed: String = "bg|0"): DataFrame = {
    import org.apache.spark.sql.functions._
    val keepBelow = ppmThreshold(interactProb)
    // native single-digest ppm coin (Md5PpmExpr): this coin runs once
    // per CANDIDATE pair of the n² cross join — the generator's hottest
    // expression — and stays bit-identical to the conv(substring(md5))
    // form the q58 oracle mirrors
    val coin = org.apache.spark.sql.graft.GraftExprBridge.md5Ppm(
      concat_ws("|", col("src"), col("dst"), lit(seed)))
    banks.select(col("b").as("src"))
      .crossJoin(banks.select(col("b").as("dst")))
      .filter(coin < keepBelow)
  }

  /** Full generator over driver-provided tables: bank accounts =
    * suppliers, client accounts = customers, base edge set = the distinct
    * customer→supplier edges (FIXTURES.md §1.4 remodel). Background random
    * edges among bank accounts at prob 1−interactProb
    * (`smurf_generator.py:57-60`).
    *
    * Returns (injected_edges, injected_labels).
    */
  def run(spark: SparkSession, edges: DataFrame,
          middleNums: Seq[Int] = Seq(10, 20, 30, 40, 50),
          folds: Int = 10, interactProb: Double = 0.9995,
          seed: Long = 0L): (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    // The base edge set and the background noise NEVER reach the driver:
    // only the planted stars (a few thousand seeded RNG draws per fold)
    // are a driver program. The previous shape collected the whole base
    // set and ran an O(|bank|²) driver loop for background edges — at
    // 10⁹-edge scale both are driver OOMs; here base stays a DataFrame and
    // the background coin is a deterministic per-pair hash evaluated
    // inside the (bank × bank) crossJoin, so the same seed yields the
    // same background on any cluster layout. (At extreme |bank| the
    // crossJoin itself would be replaced by direct sparse pair sampling —
    // expected output is |bank|²·(1−interactProb) rows either way.)
    val bin = graft.ops.GraphOps.binaryEdges(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bankAcc = bin.select(col("dst")).distinct()
      .orderBy(col("dst")).as[Long].collect()
    val clientAcc = bin.select(col("src")).distinct()
      .orderBy(col("src")).as[Long].collect()

    val banks = bin.select(col("dst").as("b")).distinct()
    val background = backgroundEdges(banks, interactProb, s"bg|$seed")
    val baseBg = bin.select(col("src"), col("dst")).union(background)

    // planted stars: tag-keyed md5 draws — independent of the base
    // content and bit-reproducible outside the JVM (see generateFolds)
    val allFolds = middleNums.flatMap(mn =>
      generateFolds(Set.empty, bankAcc, clientAcc, mn, folds, seed))
    val plantedRows = allFolds.flatMap(f =>
      f.edges.toSeq.sorted.map { case (s, d) => (f.middleNum, f.fold, s, d) })
    val planted = spark.createDataFrame(plantedRows)
      .toDF("middle_num", "fold", "src", "dst")

    val foldKeys = allFolds.map(f => (f.middleNum, f.fold))
      .toDF("middle_num", "fold")
    // every fold carries base+background; distinct dedups planted ∩ base
    // (the reference's `el` is a set, smurf_generator.py:23-37)
    val injected = broadcast(foldKeys).crossJoin(baseBg)
      .select(col("middle_num"), col("fold"), col("src"), col("dst"))
      .union(planted)
      .distinct()

    val labelRows = allFolds.map(f =>
      (f.middleNum, f.fold, f.label._1, f.label._2))
    (injected,
     spark.createDataFrame(labelRows)
       .toDF("middle_num", "fold", "label_src", "label_dst"))
  }
}
