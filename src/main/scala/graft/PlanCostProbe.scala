package graft
import org.apache.spark.sql.SparkSession

/** Dev-only probe splitting a query's wall time into (a) DataFrame
  * construction, (b) analysis+optimization+physical planning (forcing
  * `executedPlan`), and (c) execution (`count()`), to see how much of
  * the sub-second query tail is driver-side fixed cost vs real work.
  * Usage: runMain graft.PlanCostProbe [sfDir] [reps] [queryName...]
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps; q <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force full planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"PLANCOST $q%-30s build ${(t1 - t0) / 1e9}%7.3f " +
        f"plan ${(t2 - t1) / 1e9}%7.3f exec ${(t3 - t2) / 1e9}%7.3f")
    }
    spark.stop()
  }
}
