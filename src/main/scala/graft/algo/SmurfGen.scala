package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.util.Random

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

  /** Port of generate_eval_df (`smurf_generator.py:12-40`), deterministic
    * under `seed`. Uses scala.util.Random — parity with numpy's exact draws
    * is impossible and not required (SURVEY §5: planted-pattern tests
    * assert *recall*, not RNG equality).
    */
  def generateFolds(base: Set[(Long, Long)], bankAcc: Array[Long],
                    clientAcc: Array[Long], middleNum: Int, folds: Int = 10,
                    seed: Long = 0L): Seq[Fold] = {
    val rng = new Random(seed)
    def choice(arr: Array[Long]): Long = arr(rng.nextInt(arr.length))
    (0 until folds).map { f =>
      val src = choice(clientAcc)
      val dst = choice(clientAcc)
      val middles = Array.fill(middleNum)(choice(bankAcc))
      val el = mutable.Set.empty[(Long, Long)] ++ base
      middles.foreach { m => el += ((src, m)); el += ((m, dst)) }
      val noiseNum = 1 + rng.nextInt(5)
      (0 until noiseNum).foreach { _ =>
        val r = rng.nextInt(11)
        val mn = middleNum + (5 - r)
        val others = clientAcc.filter(ca => ca != src && ca != dst)
        val nSrc = choice(others)
        val nDst = choice(others)
        val nMiddle = Array.fill(math.max(mn, 0))(choice(bankAcc))
        nMiddle.foreach { mcc =>
          el += ((nSrc, mcc)); el += ((mcc, nDst))
          nMiddle.foreach { c =>
            // interaction between intermediaries (smurf_generator.py:34-37)
            if (c != mcc && (1 + rng.nextInt(10)) > r / 2.5 + 6)
              el += ((mcc, c))
          }
        }
      }
      Fold(middleNum, f, el.toSet, (src, dst))
    }
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
    import org.apache.spark.sql.functions.col

    val bin = graft.ops.GraphOps.binaryEdges(edges)
    val base = bin.as[(Long, Long)].collect().toSet
    val bankAcc = bin.select(col("dst")).distinct()
      .orderBy(col("dst")).as[Long].collect()
    val clientAcc = bin.select(col("src")).distinct()
      .orderBy(col("src")).as[Long].collect()

    val rng = new Random(seed)
    val background = for {
      s <- bankAcc; d <- bankAcc if rng.nextDouble() > interactProb
    } yield (s, d)
    val baseAll = base ++ background

    val allFolds = middleNums.flatMap(mn =>
      generateFolds(baseAll, bankAcc, clientAcc, mn, folds, seed))
    val edgeRows = allFolds.flatMap(f =>
      f.edges.toSeq.sorted.map { case (s, d) => (f.middleNum, f.fold, s, d) })
    val labelRows = allFolds.map(f =>
      (f.middleNum, f.fold, f.label._1, f.label._2))
    (spark.createDataFrame(edgeRows)
       .toDF("middle_num", "fold", "src", "dst"),
     spark.createDataFrame(labelRows)
       .toDF("middle_num", "fold", "label_src", "label_dst"))
  }
}
