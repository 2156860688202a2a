package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only JOB-level decomposition of single TxLog commit steps (the
  * guide §1 "where do the seconds live" loop at one level finer than
  * [[ChainProbe]]): a listener records every Spark job's wall time so a
  * 1.7 s commitUpsert can be attributed to its discovery collect, its
  * staged write, and the fixed per-job machinery. Not part of the
  * driver contract. Usage: runMain graft.ChainJobProbe [sfDir]
  */
object ChainJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          println(f"  JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
    })
    def t[A](tag: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val tmp = java.nio.file.Files.createTempDirectory("chainjob").toString
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val base = graft.model.Tables.events(spark, sfDir).withColumn("day",
        date_format(col("ts"), "yyyyMMdd").cast("int"))
      val t157 = s"$tmp/r$rep/events_cdf"
      t("stageInitial") {
        graft.ops.TxLog.stageInitial(spark, s"$tmp/r$rep/stage", base, "day")
      }
      t("commitInitialFrom") {
        graft.ops.TxLog.commitInitialFrom(spark, t157, s"$tmp/r$rep/stage")
      }
      t("commitDelete") {
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
      t("commitUpsert") {
        graft.ops.TxLog.commitUpsert(spark, t157, batch, "event_id", "day")
      }
      t("tableChanges+count") {
        graft.ops.TxLog.tableChanges(spark, t157, 0, 2, "event_id",
          Seq("ts", "user_id", "event_type", "value")).count()
      }
    }
    spark.stop()
  }
}
