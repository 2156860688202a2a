package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.ops.Skew

/** The scale techniques README promises, demonstrated and asserted:
  * salted aggregation equivalence on a skewed key, salted join
  * equivalence, and bucketing = shuffle-free join.
  */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val rng = new scala.util.Random(3)
    // hub key 7 holds 80% of rows — the smurf-hub shape
    Seq.fill(5000)(
      (if (rng.nextDouble() < 0.8) 7L else rng.nextInt(100).toLong,
       rng.nextInt(1000).toLong + 1))
      .toDF("key", "w")
  }

  test("saltedSum / saltedCount equal the direct aggregation") {
    val direct = skewed.groupBy($"key")
      .agg(sum($"w").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val ss = Skew.saltedSum(skewed, Seq("key"), "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sc = Skew.saltedCount(skewed, Seq("key"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ssc = Skew.saltedSumCount(skewed, Seq("key"), "w")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(ss.keySet == direct.keySet)
    direct.foreach { case (k, (s, c)) =>
      assert(ss(k) == s && sc(k) == c && ssc(k) == ((s, c)))
    }
  }

  test("saltedJoin returns the same rows as the direct join") {
    val dim = (0L to 99L).map(k => (k, s"name$k")).toDF("key", "name")
    val direct = skewed.join(dim, "key")
      .groupBy($"key").agg(count(lit(1)).as("n"), min($"name").as("nm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("key"))
      .groupBy($"key").agg(count(lit(1)).as("n"), min($"name").as("nm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == direct)
  }

  test("AQE OptimizeSkewedJoin splits a planted hub partition at " +
      "runtime — the J1 hub answer as an executed plan") {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, AQEShuffleReadExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val c = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of 200k fact rows land on hub key 7; v is hash-valued so
      // the hub's shuffle blocks can't compress away below threshold
      val fact = spark.range(200000L).select(
        when(pmod($"id", lit(100)) < 90, lit(7L))
          .otherwise(pmod($"id", lit(1000))).as("k"),
        pmod(xxhash64($"id"), lit(1000000)).as("v"))
      val dim = spark.range(1000L).select($"id".as("k"),
        ($"id" % 7).as("w"))
      val df = fact.join(dim, "k").agg(sum($"v" + $"w").as("s"))
      val got = df.collect().head.getLong(0)
      // cross-check the answer against the salted join (both skew cures
      // agree with each other and with plain arithmetic)
      val viaSalt = Skew.saltedJoin(fact, dim, Seq("k"))
        .agg(sum($"v" + $"w")).collect().head.getLong(0)
      assert(got == viaSalt)
      val adaptive = df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.nonEmpty, "no adaptive root")
      // collect() does not descend into finished query stages (their
      // plan is a field, not a child) — flatten through them explicitly
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val fin = flatten(adaptive.head.executedPlan)
      val skewJoins = fin.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j }
      assert(skewJoins.nonEmpty,
        s"OptimizeSkewedJoin did not fire:\n${adaptive.head.executedPlan}")
      // the hub partition was actually SPLIT: the fact-side skew reader
      // carries more partition specs than the shuffle had partitions
      val nShuffle = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val readers = fin.collect { case r: AQEShuffleReadExec => r }
      assert(readers.exists(_.partitionSpecs.size > nShuffle),
        s"no reader split the hub: " +
          s"${readers.map(_.partitionSpecs.size)} vs $nShuffle")
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _)) }
  }

  test("2-hop hub cap bounds pair fan-out on a planted hub") {
    // planted smurf: 0 → {1,2,3} → 4, plus a hub mid 100 that everything
    // routes through (in/out degree 30 → 900 pairs through it alone)
    val smurf = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L,
      1L -> 4L, 2L -> 4L, 3L -> 4L)
    val hubIn = (200L until 230L).map(s => s -> 100L)
    val hubOut = (300L until 330L).map(d => 100L -> d)
    val edges = (smurf ++ hubIn ++ hubOut)
      .map { case (s, d) => (s, d, 1L, 0L) }
      .toDF("src", "dst", "weight", "ts")

    val uncapped = graft.ops.GraphOps.twoHopCounts(edges, minCount = 1)
    // every (hub-in × hub-out) pair materializes without the guard
    assert(uncapped.count() >= 900L)

    val capped = graft.ops.GraphOps.twoHopCounts(edges, minCount = 1,
      maxMidDegree = Some(10L))
    val pairs = capped.select($"i", $"j").as[(Long, Long)].collect().toSet
    // hub paths are gone; the moderate-degree smurf mids survive intact
    assert(pairs == Set((0L, 4L)))
    val mids = graft.ops.GraphOps.twoHopMids(edges, minCount = 1,
      maxMidDegree = Some(10L))
      .select($"mids").collect().head.getSeq[Long](0)
    assert(mids == Seq(1L, 2L, 3L))
  }

  test("AaSmurf maxCandidates bounds the driver collect, equal when unhit") {
    // candidate-dense graph: 6 clients fan through shared mids to 6
    // targets → 36 qualifying (i,j) pairs before any cap
    val srcs = 0L until 6L
    val dsts = 200L until 206L
    val mids = 100L until 105L
    val edges = (for { s <- srcs; m <- mids } yield (s, m)) ++
      (for { m <- mids; d <- dsts } yield (m, d))
    val df = edges.map { case (s, d) => (s, d, 1L, 0L) }
      .toDF("src", "dst", "weight", "ts")

    val nCands = graft.ops.GraphOps.twoHopMids(df, minCount = 3).count()
    assert(nCands >= 36L)

    // cap ABOVE the candidate count: bit-identical model
    val full = graft.algo.AaSmurf.runModel(spark, df, minCount = 3)
    val unhit = graft.algo.AaSmurf.runModel(spark, df, minCount = 3,
      maxCandidates = Some(nCands.toInt + 10))
    assert(unhit.order.sameElements(full.order))
    assert(unhit.mdlTrace.sameElements(full.mdlTrace))

    // cap BELOW: still runs, and the greedy sees the cnt-desc prefix —
    // the first committed block matches the uncapped first block
    val capped = graft.algo.AaSmurf.runModel(spark, df, minCount = 3,
      maxCandidates = Some(5))
    assert(capped.order.length == full.order.length) // full permutation
    assert(capped.iterations >= 1)
  }

  test("bucketed tables co-locate the join: no shuffle on the join keys") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket")
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '${wh.toString}'")
    try {
      val a = (0L until 1000L).map(i => (i % 50, i)).toDF("k", "va")
      val b = (0L until 500L).map(i => (i % 50, i * 2)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable(s"$db.ta")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable(s"$db.tb")
      // disable broadcast so the join would otherwise shuffle both sides
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table(s"$db.ta").join(spark.table(s"$db.tb"), "k")
        val shuffles = j.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec => s
        }
        assert(shuffles.isEmpty,
          s"expected shuffle-free bucketed join, found ${shuffles.size}")
        assert(j.count() == 50L * 20L * 10L) // 50 keys × 20 × 10 rows
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("runtime bloom-filter join reduction: a selective dim filter " +
      "prunes the fact side BEFORE its shuffle") {
    // the big-big join shape where neither side broadcasts: Spark's
    // runtime filter turns the filtered dim side into a bloom filter
    // applied to the fact side's scan — at 100 TB the fact shuffle
    // carries only might-match rows. Thresholds are lowered to make the
    // optimizer fire at spec scale; the assertion is the INJECTION and
    // value-equality, the production win is the pruned shuffle.
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // parquet sources (the runtime filter only targets file scans)
      (0L until 200000L).map(i => (i % 1000, i)).toDF("k", "payload")
        .write.mode("overwrite").parquet(s"$dir/fact")
      (0L until 1000L).map(i => (i, s"d$i")).toDF("k", "attr")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
        .filter(col("attr").isin("d3", "d47", "d901")) // selective
      val j = fact.join(dim, "k")
      val hasBloom = j.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("bloomfilter")
      assert(hasBloom,
        s"no runtime bloom filter injected:\n${j.queryExecution.optimizedPlan}")
      assert(j.count() == 3L * 200L) // 3 keys × 200 fact rows each
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
