package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed over two passes.
  *
  * Pass 1 (cold) pays JIT, parquet-footer reads, and the one-time build of
  * the shared persisted intermediates (focus table, fold tables); pass 2
  * (warm) is the steady-state a long-running deployment sees. `value`
  * stays the COLD total — methodology-compatible with earlier rounds'
  * single-pass numbers — and `warm_value`/`warm_queries` ride alongside so
  * round-over-round comparisons have a number that isn't dominated by
  * this box's documented >±20 % co-tenant swing and ~10 s first-query
  * JIT/footer warm-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic name order: round-over-round comparability, and the
    // cheap scan/filter queries warm the JIT before the heavy ML ones
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a query that throws must not silently bench as "fast": record it
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => errors += name }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val cold = pass()
    val warm = pass()
    // an errored query's partial elapsed time must not deflate (or
    // inflate) the headline totals — totals aggregate successes only
    def ok(rs: Seq[(String, Double)]): Seq[(String, Double)] =
      rs.filterNot { case (k, _) => errors.contains(k) }
    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val coldTotal = ok(cold).map(_._2).sum
    val warmTotal = ok(warm).map(_._2).sum
    // per-query min over the passes: the noise-robust estimator on a box
    // with documented >±20 % co-tenant swing (each query's floor is the
    // honest steady-state; a single co-tenant burst can't inflate it)
    val bestTotal = ok(cold).zip(ok(warm))
      .map { case ((_, c), (_, w)) => math.min(c, w) }.sum
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$coldTotal,"unit":"sec","queries":${fmt(cold)},"warm_value":$warmTotal,"warm_queries":${fmt(warm)},"best_value":$bestTotal,"errors":$errs,"sf":"$sfDir"}""")
    // totals-only line LAST: the full line above leads with the totals and
    // r03's artifact lost them to tail truncation — any tail capture of
    // this output keeps all three totals + the error list
    println(s"""{"metric":"totals_tail","cold":$coldTotal,"warm":$warmTotal,"best":$bestTotal,"n_queries":${ok(cold).size},"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
