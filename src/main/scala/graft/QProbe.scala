package graft
import org.apache.spark.sql.SparkSession

/** Timing probe for individual queries during optimization work.
  * Usage: runMain graft.QProbe [sfDir] [queryName...]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q31_aa_ar_change_scores", "q34_focus_scores")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // decoupled override: at a fixed core count, more (smaller) shuffle
    // partitions is the knob a real cluster turns as data grows — used
    // to attribute super-linear scale-harness results to per-task size
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // dev-only A/B hook: SPARK_GRAFT_CONF="k=v;k=v" layers arbitrary
    // session confs over the bench baseline, so a config candidate can
    // be measured per query before touching the bench contract
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(';').iterator.map(_.trim).filter(_.nonEmpty)
      .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(s"PROBE $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
