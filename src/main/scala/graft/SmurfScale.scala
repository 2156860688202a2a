package graft

import java.io.{BufferedWriter, FileWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.SmurfGen

/** Reference-scale end-to-end run record for the AA-Smurf pipeline
  * (dev tool, run manually; results recorded in README).
  *
  * The reference reports on the PKDD'99 Czech financial dataset —
  * ~11.4k accounts, ~273k transfers (`/root/reference/AA-Smurf.py` and
  * `smurf_generator.py:45-60` consume exactly that shape). The sample
  * matrix in the repo is 254 nodes; this main proves the engine's M6
  * bounded-collect claims AT THE REFERENCE'S OWN PUBLISHED SCALE:
  *
  *   1. synthesize a Czech-scale background graph (11,374 accounts,
  *      md5-coin sparse pairs at ~273k expected edges — the exact
  *      [[SmurfGen.backgroundEdges]] construction, so any engine
  *      reproduces the same graph from the seed);
  *   2. plant seeded smurf stars ([[SmurfGen.generateFolds]], the
  *      reference's §3.3 evaluation design) across three middle sizes;
  *   3. write the fold-0 graph as the reference's S2 dense-matrix text
  *      and run the FULL user CLI path — [[Main.runAaSmurf]]: dense
  *      scan → 2-hop candidate mining → greedy MDL reordering —
  *      wall-clock timed. The loop is capped at 60 iterations (the
  *      CLI's `--i`, the reference's own `max_iter` knob): at this
  *      scale the background yields ~2.7k candidate blocks and the
  *      UNCAPPED loop keeps appending marginal blocks for hours, while
  *      the model-selection scan (§2.6) picks an early iteration
  *      regardless — the cap bounds wall-time without changing the
  *      selected model's character;
  *   4. score planted-pair recall over every fold with the q39 miner.
  *
  * Prints one JSON line:
  * {"nodes":N,"edges":E,"order_rows":M,"aasmurf_sec":S,
  *  "recall":{"10":r,"30":r,"50":r}}
  */
object SmurfScale {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/smurf_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Czech-financial scale: 11,374 accounts; expected background edges
    // ≈ 273k → keep probability 273000 / 11374² per ordered pair
    val nAcc = 11374
    val targetEdges = 273000L
    val clientAcc: Array[Long] = (0L until 8000L).toArray
    val bankAcc: Array[Long] = (8000L until nAcc.toLong).toArray
    val interactProb = 1.0 - targetEdges.toDouble / (nAcc.toDouble * nAcc)

    val acc = spark.range(nAcc).toDF("b")
    val bg = SmurfGen.backgroundEdges(acc, interactProb, seed = "czech|7")
      .filter(col("src") =!= col("dst"))
      .persist()
    val nBg = bg.count()

    // planted stars: three middle sizes × three folds (seeded, driver-side
    // — a few thousand RNG draws, same contract as SmurfGen.run)
    val middleNums = Seq(10, 30, 50)
    val allFolds = middleNums.flatMap(mn =>
      SmurfGen.generateFolds(Set.empty, bankAcc, clientAcc, mn,
        folds = 3, seed = 7L))

    // ---- wall-clock the full CLI path on the fold-0 graph ------------
    // fold 0 of middleNum=30, written as the reference's dense S2 text
    val f0 = allFolds.find(f => f.middleNum == 30 && f.fold == 0).get
    val adj: Array[java.util.BitSet] =
      Array.fill(nAcc)(new java.util.BitSet(nAcc))
    bg.select(col("src"), col("dst")).collect()
      .foreach(r => adj(r.getLong(0).toInt).set(r.getLong(1).toInt))
    f0.edges.foreach { case (s, d) => adj(s.toInt).set(d.toInt) }
    val matrixPath = s"$outDir/czech_matrix.txt"
    new java.io.File(outDir).mkdirs()
    val w = new BufferedWriter(new FileWriter(matrixPath), 1 << 20)
    (0 until nAcc).foreach { i =>
      val sb = new java.lang.StringBuilder(2 * nAcc)
      var j = 0
      while (j < nAcc) {
        if (j > 0) sb.append(' ')
        sb.append(if (adj(i).get(j)) '1' else '0')
        j += 1
      }
      w.write(sb.toString); w.newLine()
    }
    w.close()

    val t0 = System.nanoTime()
    val nOrder = Main.runAaSmurf(spark, matrixPath, s"$outDir/aasmurf_out",
      maxIter = Some(60))
    val secs = (System.nanoTime() - t0) / 1e9

    // ---- planted-pair recall over every fold (the q39 miner) ---------
    val foldKeys = allFolds.map(f => (f.middleNum, f.fold))
      .toDF("middle_num", "fold")
    val planted = spark.createDataFrame(
        allFolds.flatMap(f => f.edges.toSeq.sorted.map {
          case (s, d) => (f.middleNum, f.fold, s, d) }))
      .toDF("middle_num", "fold", "src", "dst")
    val injected = broadcast(foldKeys)
      .crossJoin(bg.select(col("src"), col("dst")))
      .select(col("middle_num"), col("fold"), col("src"), col("dst"))
      .union(planted).distinct()
    val cands = injected.select(col("middle_num"), col("fold"),
        col("src").as("i"), col("dst").as("m"))
      .join(injected.select(col("middle_num"), col("fold"),
        col("src").as("m"), col("dst").as("j")),
        Seq("middle_num", "fold", "m"))
      .groupBy(col("middle_num"), col("fold"), col("i"), col("j"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3)
    val labels = spark.createDataFrame(
        allFolds.map(f => (f.middleNum, f.fold, f.label._1, f.label._2)))
      .toDF("middle_num", "fold", "label_src", "label_dst")
    val recall = labels.join(cands,
        labels("middle_num") === cands("middle_num") &&
          labels("fold") === cands("fold") &&
          labels("label_src") === cands("i") &&
          labels("label_dst") === cands("j"), "left")
      .groupBy(labels("middle_num"))
      .agg(avg(when(col("cnt").isNotNull, 1.0).otherwise(0.0))
        .as("recall"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    val recallJson = middleNums
      .map(mn => s""""$mn":${recall.getOrElse(mn, 0.0)}""")
      .mkString("{", ",", "}")
    println(s"""{"nodes":$nAcc,"edges":$nBg,"order_rows":$nOrder,""" +
      s""""aasmurf_sec":$secs,"recall":$recallJson}""")
    spark.stop()
  }
}
