package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for the q31/q34/q45 focus-pipeline COLD
  * build (the round-16 target: ~36 s of the bench's cold pass on a quiet
  * box). Times each stage with the noop sink (guide §1.4), in dependency
  * order so deltas attribute to the newly-exercised stage. Not part of
  * the driver contract. Usage: runMain graft.FocusProbe [sfDir]
  */
object FocusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val edges = graft.model.Tables.edges(spark, sfDir)
    t("edges.scan")(noop(edges))
    val wedges = graft.ops.Windows.withWindowId(edges, 28, 14)
    t("windowed")(noop(wedges))
    val feats = graft.ops.Features.accountFeaturesByWindow(wedges)
    t("features(28,14)")(noop(feats))
    t("features again")(noop(feats))
    val focus = graft.algo.AaAr.focusScores(feats, numTrees = 24)
    t("focusScores(24)")(noop(focus))
    t("focusScores again")(noop(focus))
    val focus1 = graft.algo.AaAr.focusScores(feats, numTrees = 1)
    t("focusScores(1 tree)")(noop(focus1))
    val sk = graft.algo.AaAr.sketches(
      focus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      sketchNum = 64, numDst = 3)
    t("sketches(64)")(noop(sk))
    t("changeScores")(noop(graft.algo.AaAr.changeScores(sk, 4)))
    spark.stop()
  }
}
