package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.algo.{AaAr, AaSmurf}
import graft.ops.{Features, Windows}

/** User-facing CLI — the parity surface for the reference's runnable
  * programs (`/root/reference/AA-AR.py:270-287` and
  * `/root/reference/AA-Smurf.py:184-191` argparse): point it at the same
  * input files, get the same result tables (as parquet — the reference's
  * PNGs are presentations of exactly these tables, SURVEY S6).
  *
  * Flags mirror the reference's names:
  *   aa-ar    --f edges.csv  --o outdir  --w windowSize  --s sketchNum
  *            --b backtrackWindows  --a attentionFigures  --c attentionAccounts
  *   aa-smurf --f matrix.txt --o outdir  --i maxIter
  *
  * Master defaults to local[*]; set SPARK_MASTER / SPARK_GRAFT_CPUS to
  * override (a cluster deployment passes its own master URL).
  */
object Main {
  private val usage =
    """usage:
      |  graft.Main aa-ar    --f <edges.csv>  [--o <outdir>] [--w 14] [--s 256] [--b 4] [--a 3] [--c 3]
      |  graft.Main aa-smurf --f <matrix.txt> [--o <outdir>] [--i <maxIter>]
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val opts = args.tail.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    def opt(k: String, dflt: String) = opts.getOrElse(k, dflt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        if (cpus == "*") "32" else cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      args.head match {
        case "aa-ar" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val (nChanges, nRouted) = runAaAr(spark, in, opt("--o", "results"),
            windowSize = opt("--w", "14").toInt,
            sketchNum = opt("--s", "256").toInt,
            backWs = opt("--b", "4").toInt,
            numFigures = opt("--a", "3").toInt,
            numAccounts = opt("--c", "3").toInt)
          println(s"AA-AR: $nChanges change-score windows, " +
            s"$nRouted attended accounts -> ${opt("--o", "results")}")
        case "aa-smurf" =>
          val in = opts.getOrElse("--f",
            { System.err.println(usage); sys.exit(2); "" })
          val n = runAaSmurf(spark, in, opt("--o", "results"),
            maxIter = opts.get("--i").map(_.toInt))
          println(s"AA-Smurf: $n positions -> ${opt("--o", "results")}")
        case other =>
          System.err.println(s"unknown command: $other\n$usage")
          sys.exit(2)
      }
    } finally spark.stop()
  }

  /** aa-ar pipeline on an arbitrary session (main's happy path, and the
    * MainSpec entry — main itself owns/stops its session and exits on bad
    * flags, so tests drive this instead). Returns (change-score rows,
    * attended-account rows) after writing both tables under `out`.
    */
  def runAaAr(spark: SparkSession, in: String, out: String,
              windowSize: Int = 14, sketchNum: Int = 256, backWs: Int = 4,
              numFigures: Int = 3, numAccounts: Int = 3): (Long, Long) = {
    val edges = graft.sources.Sources.edgeCsv(spark, in)
    // same staging as SparkEntry: ONE persisted focus table feeds
    // both the sketch stage and the routing stage
    val focus = AaAr.focusScores(
      Features.accountFeaturesByWindow(
        Windows.withWindowId(edges, windowSize, windowSize / 2)),
      numTrees = 100).persist(StorageLevel.MEMORY_AND_DISK)
    val changes = AaAr.runFromFocus(focus, sketchNum = sketchNum,
      backWs = backWs, numDst = numFigures)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val routing = AaAr.attentionRouting(focus, changes,
      numFigures = numFigures, numAccounts = numAccounts)
    changes.write.mode("overwrite").parquet(s"$out/change_score")
    routing.write.mode("overwrite").parquet(s"$out/attention_routing")
    val n = (changes.count(), routing.count())
    focus.unpersist(); changes.unpersist()
    n
  }

  /** aa-smurf pipeline on an arbitrary session; returns the number of
    * reordered positions after writing the table under `out`.
    */
  def runAaSmurf(spark: SparkSession, in: String, out: String,
                 maxIter: Option[Int] = None): Long = {
    val edges = graft.sources.Sources.denseMatrix(spark, in)
    val order = AaSmurf.run(spark, edges, minCount = 3, maxIter = maxIter)
    order.write.mode("overwrite").parquet(s"$out/smurf_order")
    order.count()
  }
}
