package graft

import graft.algo.{AaSmurf, SmurfGen}
import org.apache.spark.sql.functions._

/** §3.3 generator: determinism, planted-label structure, and the
  * reference's own eval design — AA-Smurf recovers the injected star
  * (SURVEY §5 planted-pattern recall).
  */
class SmurfGenSpec extends SparkSpec {
  import spark.implicits._

  test("generateFolds is deterministic under seed and plants the star") {
    val base = Set((1L, 2L))
    val banks = (100L to 120L).toArray
    val clients = (1L to 20L).toArray
    val f1 = SmurfGen.generateFolds(base, banks, clients, 5, 3, seed = 9L)
    val f2 = SmurfGen.generateFolds(base, banks, clients, 5, 3, seed = 9L)
    assert(f1.map(_.edges) == f2.map(_.edges))
    assert(f1.map(_.label) == f2.map(_.label))
    f1.foreach { fold =>
      val (src, dst) = fold.label
      // the planted star: middles drawn WITH replacement (np.random.choice
      // semantics, smurf_generator.py:16) so distinct count can dip below
      // middleNum — but most draws are distinct from a 21-account pool
      val outs = fold.edges.collect { case (s, m) if s == src => m }
      val ins = fold.edges.collect { case (m, d) if d == dst => m }
      assert(outs.toSet.intersect(ins.toSet).size >= 3)
    }
  }

  test("planted-pattern recall: AA-Smurf mines the injected (src,dst)") {
    val clients = (0L to 9L).toArray
    val banks = (100L to 139L).toArray
    val base = Set((0L, 100L), (100L, 1L), (2L, 101L)) // sparse background
    val folds = SmurfGen.generateFolds(base, banks, clients, 8, 2, seed = 3L)
    folds.foreach { fold =>
      val edges = fold.edges.toSeq.map { case (s, d) => (s, d, 1L, 0L) }
        .toDF("src", "dst", "weight", "ts")
      val cands = graft.ops.GraphOps.twoHopCounts(edges, 3)
        .orderBy($"cnt".desc).collect()
      assert(cands.nonEmpty)
      // injected star must be among the mined candidates (recall)
      val pairs = cands.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains(fold.label),
        s"label ${fold.label} not in ${pairs.take(5).mkString(",")}")
    }
  }

  test("h28 equals the oracle's md5-hex-prefix BIGINT (DuckDB goldens)") {
    // the exact values CAST(('0x' || substr(md5(tag), 1, 7)) AS BIGINT)
    // yields in DuckDB — the tag-keyed draw and its SQL mirror must agree
    // on every byte or the q33/q38/q39 hash gate goes red
    assert(SmurfGen.h28("sg|0|10|0|s") == 66625135L)
    assert(SmurfGen.h28("sg|0|50|9|n|4|x|54|53") == 40816510L)
    assert(SmurfGen.h28("a") == 13375323L)
  }

  test("ppmThreshold rounds, matching the q58 oracle's integer threshold") {
    // 1.0-0.9995 = 4.999…e-4 in double; truncation would give 499 and
    // silently drop pairs whose md5 ppm coin is exactly 499 — diverging
    // from the oracle's `< 500`
    assert(SmurfGen.ppmThreshold(0.9995) == 500L)
    assert(SmurfGen.ppmThreshold(0.999) == 1000L)
    assert(SmurfGen.ppmThreshold(0.99) == 10000L)
    assert(SmurfGen.ppmThreshold(1.0) == 0L)
  }

  test("run() emits long-form fold tables with consistent keys") {
    val edges = Seq((0L, 100L), (1L, 101L), (2L, 102L), (100L, 3L))
      .map { case (s, d) => (s, d, 1L, 0L) }
      .toDF("src", "dst", "weight", "ts")
    val (ed, lab) = SmurfGen.run(spark, edges, middleNums = Seq(3),
      folds = 2, seed = 1L)
    assert(ed.select($"fold").distinct().count() == 2)
    assert(lab.count() == 2)
    val labels = lab.select($"label_src", $"label_dst")
      .as[(Long, Long)].collect()
    labels.foreach { case (s, d) =>
      // labels are client accounts (src universe)
      assert(Set(0L, 1L, 2L, 100L).contains(s))
    }
  }
}
