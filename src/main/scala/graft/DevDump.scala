package graft

import org.apache.spark.sql.SparkSession

/** TEMP dev tool (round 11): dump AaAr intermediates for oracle diffing. */
object DevDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val focus = graft.algo.AaAr.focusScores(
      graft.ops.Features.accountFeaturesByWindow(
        graft.ops.Windows.withWindowId(
          graft.model.Tables.edges(spark, sfDir), 28, 14)),
      numTrees = SparkEntry.SharedFocusTrees)
    focus.coalesce(1).write.mode("overwrite").parquet(s"$outDir/focus")
    val sk = graft.algo.AaAr.sketches(focus, sketchNum = 64)
    sk.coalesce(1).write.mode("overwrite").parquet(s"$outDir/sk")
  }
}
