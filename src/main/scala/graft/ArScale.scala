package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-scale end-to-end run record for the AA-AR pipeline — the
  * companion to [[SmurfScale]] (dev tool, run manually; results recorded
  * in README).
  *
  * The reference's AA-AR consumes a temporal edge CSV
  * (`/root/reference/AA-AR.py:286-287`) at Czech-financial scale
  * (~11.4k accounts, ~273k dated transfers). This main synthesizes a
  * deterministic temporal edge list at exactly that scale — the
  * [[graft.algo.SmurfGen.backgroundEdges]] md5-coin pair construction
  * for the topology, md5 ppm coins for weight and day-number timestamp,
  * so the same seed yields the same CSV anywhere — writes it in the
  * reference's S1 CSV shape, and wall-clock-times the FULL user CLI
  * path ([[Main.runAaAr]]): CSV scan → sliding-window 12-feature
  * aggregation → per-(window, pair) isolation-forest focus scores →
  * seeded sketch projections → trailing-frame SVD change scores →
  * attention routing → parquet + PNG sinks.
  *
  * Prints one JSON line:
  * {"nodes":N,"edges":E,"changes":C,"routed":R,"aaar_sec":S}
  */
object ArScale {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/ar_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Czech-financial scale: 11,374 accounts, ~273k transfers dated over
    // ~2 years of integer day numbers (the reference's abstract periods)
    val nAcc = 11374
    val targetEdges = 273000L
    val days = 720L
    val interactProb = 1.0 - targetEdges.toDouble / (nAcc.toDouble * nAcc)
    val acc = spark.range(nAcc).toDF("b")
    def ppm(cols: org.apache.spark.sql.Column*) =
      org.apache.spark.sql.graft.GraftExprBridge
        .md5Ppm(concat_ws("|", cols: _*))
    val edges = graft.algo.SmurfGen
      .backgroundEdges(acc, interactProb, seed = "ar|7")
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        (ppm(col("src"), col("dst"), lit("w")) % 9999L + 1L).as("weight"),
        (ppm(col("src"), col("dst"), lit("t")) % days).as("ts"))
      .persist()
    val nEdges = edges.count()

    // the reference's S1 CSV shape, one header + 4 integer columns
    new java.io.File(outDir).mkdirs()
    edges.select(col("src").as("Source"), col("dst").as("Destination"),
        col("weight").as("Weight"), col("ts").as("Timestamp"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/edges_csv")

    val t0 = System.nanoTime()
    val (nChanges, nRouted) = Main.runAaAr(spark,
      s"$outDir/edges_csv", s"$outDir/aaar_out")
    val secs = (System.nanoTime() - t0) / 1e9

    println(s"""{"nodes":$nAcc,"edges":$nEdges,""" +
      s""""changes":$nChanges,"routed":$nRouted,"aaar_sec":$secs}""")
    spark.stop()
  }
}
