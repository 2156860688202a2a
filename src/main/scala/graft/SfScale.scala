package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** sf≈1.0 spot-bench: the ten most expensive bench queries run against a
  * 10× replication of the sf0.1 tables (dev tool, run manually; results
  * recorded in README, like the other scale harnesses).
  *
  * The driver ships no sf1.0 fixtures, so the harness builds an
  * sf1.0-shaped one from sf0.1:
  *  - fact tables (orders, lineitem, events) become `factor` key-shifted
  *    copies — each id column shifts by copy·(max+1), so key spaces are
  *    disjoint per copy, joins stay consistent within a copy, the
  *    transaction graph grows ~10× nodes at constant density, and group
  *    cardinality scales the way a bigger corpus's would (TPC-H sf
  *    scaling keeps the date range constant the same way);
  *  - documents is synthesized fresh at 10× with TextScale's Zipf
  *    generator (verbatim replication would plant every doc as a 10-way
  *    duplicate family and blow the LSH pair count quadratically — a
  *    pathological corpus, not a bigger one);
  *  - dim tables pass through unchanged (their scaling is irrelevant to
  *    the ten queries, which never aggregate over dims).
  *
  * Purpose (VERDICT r12 #7): catch any super-linear surprise the
  * fixed-SF gate can't see — each query's sf0.1→sf1.0 wall-clock ratio
  * prints next to its time; a healthy ratio is ≲ 12× (10× data plus
  * shuffle/log overhead), and anything beyond says the plan does not
  * scale linearly in this regime.
  */
object SfScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = args.drop(1).headOption.getOrElse("/tmp/graft_sfscale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    val tGen = t0()
    // One shift per key DOMAIN, not per table (round-14 advice):
    // l_orderkey and o_orderkey must shift by the SAME amount or copies
    // 1..9 of the two facts misalign on the join key whenever the
    // per-table maxes differ (an order with no lineitems) — and the
    // scale ratio would silently measure a mostly-empty join. The
    // domain shift is the max over every table carrying the domain,
    // which keeps copies disjoint regardless of which side is ahead.
    val tablesKeys = Seq(
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_suppkey", "l_partkey"),
      "events" -> Seq("event_id", "user_id"))
    val domainOf = Map(
      "o_orderkey" -> "orderkey", "l_orderkey" -> "orderkey",
      "o_custkey" -> "custkey", "l_suppkey" -> "suppkey",
      "l_partkey" -> "partkey", "event_id" -> "eventid",
      "user_id" -> "userid")
    val domainShift: Map[String, Long] = tablesKeys
      .flatMap { case (name, keys) =>
        val t = spark.read.parquet(s"$src/$name.parquet")
        keys.map(k => domainOf(k) ->
          (t.agg(max(col(k))).head.getAs[Number](0).longValue + 1L))
      }
      .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).max }
    def shifted(name: String, keys: Seq[String]): Unit = {
      val t = spark.read.parquet(s"$src/$name.parquet")
      (0 until factor).map { i =>
        keys.foldLeft(t) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * domainShift(domainOf(k))))
        }
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/$name.parquet")
    }
    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("lineitem", Seq("l_orderkey", "l_suppkey", "l_partkey"))
    shifted("events", Seq("event_id", "user_id"))
    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
      .foreach { name =>
        spark.read.parquet(s"$src/$name.parquet")
          .write.mode("overwrite").parquet(s"$work/$name.parquet")
      }
    // documents: TextScale's deterministic Zipf corpus at factor× size,
    // in the testdata schema (doc_id, text, lang, source, n_chars)
    val nDocs = spark.read.parquet(s"$src/documents.parquet").count() * factor
    def u(a: Column, b: Column, c: Double): Column = {
      val s = sin(a * 12.9898 + b * 78.233 + c * 37.719) * 43758.5453
      s - floor(s)
    }
    def word(cid: Column, p: Column, salt: Double): Column =
      concat(lit("w"), floor(pow(lit(50000.0), u(cid, p, salt))).cast("long"))
    val id = col("id")
    val len = (lit(50) + floor(u(id, lit(-1.0), 1.0) * 150)).cast("int")
    spark.range(nDocs).select(id.as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), len - 1),
          p => word(id, p.cast("double"), 0.0))).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(id, lit(5L))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val genSec = secs(tGen)

    // VERDICT r12's top-10 by quiet-bench cost. Constraint: shifted
    // fact FKs (l_partkey/l_suppkey/o_custkey copies ≥ 1) dangle
    // against the UNSHIFTED dims — fine for this list, which never
    // joins a fact to a dim; extend the dim replication before adding
    // a fact⋈dim query here.
    val names = Seq("q109_triangle_counts", "q45_attention_routing",
      "q130_time_travel", "q51_mdl_block_costs", "q121_gdpr_delete",
      "q127_compaction", "q126_bloom_semijoin", "q52_permute_degree",
      "q23_minhash_pairs", "q110_dpp_prune",
      // round-14 newcomers on the fresh-generated document corpus
      // (dim-safe: neither joins a fact to a dim)
      "q147_phash_neardup", "q149_incremental_neardup",
      // round-15 newcomers: the versioned-log write cycle + CDF on the
      // 10× events log (day partitions hold 10× rows each — commit and
      // prune cost under partition growth), and the two new dedup
      // modalities on the fresh corpus. q151's prune RATIO legitimately
      // degrades here: copy-shifted event ids widen each day's id range
      // (the wide-file caveat at table scale), while the commit path
      // under test scales with the log.
      "q151_stats_pruned_scan", "q152_optimize_commit",
      "q157_table_changes", "q154_audio_neardup",
      "q155_paragraph_dedup")
    val times = names.map { name =>
      val t = t0()
      val n = util.Pins.scoped {
        SparkEntry.queries(name)(spark, work).count()
      }
      val dt = secs(t)
      println(f"[sfscale] $name%-24s $dt%8.1f s  ($n rows)")
      name -> dt
    }
    val qj = times.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"harness":"sfscale","factor":$factor,"gen_sec":$genSec,""" +
      s""""queries":{$qj},"total_sec":${times.map(_._2).sum}}""")
    spark.stop()
  }
}
