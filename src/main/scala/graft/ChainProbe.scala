package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only per-step timing probe for the TxLog commit-chain queries
  * (q152/q157/q158): times each commit of the chain separately so
  * optimization work can see which pass the seconds live in. Same
  * session shape as [[QProbe]]; not part of the driver contract.
  * Usage: runMain graft.ChainProbe [sfDir] [reps]
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val tmp = java.nio.file.Files.createTempDirectory("chainprobe").toString
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val base = graft.model.Tables.events(spark, sfDir).withColumn("day",
        date_format(col("ts"), "yyyyMMdd").cast("int"))
      // --- q157 shape ---
      val t157 = s"$tmp/r$rep/events_cdf"
      t("157.stageInitial") {
        graft.ops.TxLog.stageInitial(spark, s"$tmp/r$rep/stage", base, "day")
      }
      t("157.commitInitialFrom") {
        graft.ops.TxLog.commitInitialFrom(spark, t157, s"$tmp/r$rep/stage")
      }
      t("157.commitDelete") {
        graft.ops.TxLog.commitDelete(spark, t157,
          base.filter(col("event_id") % 13 === 0).select("event_id"),
          "event_id", "day")
      }
      val upd = col("event_id") % 13 =!= 0 && col("event_id") % 17 === 0
      val batch = base.filter(upd)
        .withColumn("event_type", lit("corrected"))
        .withColumn("value", col("value") + 1000.0)
        .unionByName(base.filter(col("event_id") % 23 === 0)
          .withColumn("event_id", col("event_id") + 3000000000L)
          .withColumn("event_type", lit("ins"))
          .withColumn("value", lit(2.5)))
      t("157.commitUpsert") {
        graft.ops.TxLog.commitUpsert(spark, t157, batch, "event_id", "day")
      }
      t("157.tableChanges+count") {
        graft.ops.TxLog.tableChanges(spark, t157, 0, 2, "event_id",
          Seq("ts", "user_id", "event_type", "value")).count()
      }
      // --- q158 shape ---
      val t158 = s"$tmp/r$rep/events_mor"
      t("158.commitInitialFrom") {
        graft.ops.TxLog.commitInitialFrom(spark, t158, s"$tmp/r$rep/stage")
      }
      t("158.commitDeleteMor") {
        graft.ops.TxLog.commitDeleteMor(spark, t158,
          base.filter(col("event_id") % 13 === 0).select("event_id"),
          "event_id")
      }
      t("158.commitAppend") {
        graft.ops.TxLog.commitAppend(spark, t158,
          base.filter(col("event_id") % 13 === 0 && col("event_id") % 3 === 0)
            .withColumn("event_type", lit("reingest")), "day")
      }
      t("158.commitPurgeMor") {
        graft.ops.TxLog.commitPurgeMor(spark, t158, "day")
      }
      t("158.face2+count") {
        graft.ops.TxLog.readVersion(spark, t158, 2).count()
      }
      t("158.face3+count") {
        graft.ops.TxLog.readVersion(spark, t158, 3).count()
      }
      // --- q152 shape ---
      val t152 = s"$tmp/r$rep/events_opt"
      t("152.commitInitialFrom") {
        graft.ops.TxLog.commitInitialFrom(spark, t152, s"$tmp/r$rep/stage",
          statsCols = Seq("event_id"))
      }
      t("152.commitAppend") {
        graft.ops.TxLog.commitAppend(spark, t152,
          base.filter(dayofmonth(col("ts")) <= 10)
            .withColumn("event_id", col("event_id") + 2000000000L)
            .withColumn("event_type", lit("backfill")), "day",
          statsCols = Seq("event_id"))
      }
      t("152.commitOptimize") {
        graft.ops.TxLog.commitOptimize(spark, t152, "day",
          zorder = Seq("user_id"), statsCols = Seq("event_id"))
      }
      t("152.faces+count") {
        (0 to 2).foreach { v =>
          graft.ops.TxLog.readVersion(spark, t152, v).count()
        }
      }
    }
    spark.stop()
  }
}
