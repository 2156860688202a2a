package graft

import graft.ext.SimSearch
import org.apache.spark.sql.functions._

/** ANN extension surface: brute-force exactness + LSH candidate recall. */
class SimSearchSpec extends SparkSpec {
  import spark.implicits._

  // 3 clusters along distinct axes + the query near cluster 0
  private lazy val corpus = {
    def vec(axis: Int, scale: Float): Seq[Float] =
      Seq.tabulate(8)(i => if (i == axis) scale else 0.01f * ((i + axis) % 3))
    (Seq((0L, vec(0, 1.0f)), (1L, vec(0, 0.9f)), (2L, vec(0, 1.1f))) ++
     Seq((3L, vec(3, 1.0f)), (4L, vec(3, 0.8f))) ++
     Seq((5L, vec(6, 1.0f)), (6L, vec(6, 1.2f))))
      .toDF("vec_id", "embedding")
  }

  test("localKMeans recovers separated cluster means; deterministic; k>n clamps") {
    // two tight 1-D clusters around 0 and 10
    val pts = Array(0.0, 0.1, -0.1, 10.0, 10.1, 9.9).map(Array(_))
    val cs = SimSearch.localKMeans(pts, 2, seed = 7L).map(_(0)).sorted
    assert(math.abs(cs(0) - 0.0) < 1e-9 && math.abs(cs(1) - 10.0) < 1e-9)
    val again = SimSearch.localKMeans(pts, 2, seed = 7L).map(_(0)).sorted
    assert(cs.sameElements(again))
    // more centers than points: clamp, every center is a point mean
    val clamped = SimSearch.localKMeans(Array(Array(1.0), Array(2.0)), 5)
    assert(clamped.length == 2)
  }

  test("brute force top-k ranks same-axis vectors first, excludes self") {
    val q = corpus.filter($"vec_id" === 0L)
    val got = SimSearch.bruteForceTopK(corpus, q, 3).collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("query_id") == 0L))
    assert(got.forall(_.getAs[Long]("nbr_id") != 0L))
    val byRank = got.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("nbr_id"))
    assert(byRank.take(2).toSet == Set(1L, 2L)) // same axis as query
  }

  test("cos scores are descending with rank and within [-1, 1]") {
    val q = corpus.filter($"vec_id" < 2L)
    val got = SimSearch.bruteForceTopK(corpus, q, 5).collect()
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.sameElements(cs.sorted.reverse))
      cs.foreach(c => assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
    }
  }

  test("LSH top-k finds the exact nearest neighbor for clustered data") {
    val q = corpus.filter($"vec_id" === 0L)
    val exact = SimSearch.bruteForceTopK(corpus, q, 1).collect().head
    val lsh = SimSearch.lshTopK(corpus, q, dim = 8, k = 1).collect()
    // recall@1: with 4 OR-ed bands the same-axis cluster must collide
    assert(lsh.nonEmpty)
    assert(lsh.head.getAs[Long]("nbr_id") == exact.getAs[Long]("nbr_id"))
    assert(math.abs(lsh.head.getAs[Double]("cos") -
      exact.getAs[Double]("cos")) < 1e-12)
  }

  test("LSH candidate set never crosses orthogonal clusters at rank 1") {
    val q = corpus.filter($"vec_id" === 5L)
    val got = SimSearch.lshTopK(corpus, q, dim = 8, k = 2).collect()
    assert(got.nonEmpty)
    assert(got.head.getAs[Long]("nbr_id") == 6L)
  }

  test("IVF top-k matches brute force on clustered data (recall@1)") {
    val q = corpus.filter($"vec_id" === 0L || $"vec_id" === 5L)
    val exact = SimSearch.bruteForceTopK(corpus, q, 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("nbr_id")).toMap
    // nlist = 3 cells over 3 true clusters; probe 2 for margin
    val ivf = SimSearch.ivfTopK(corpus, q, dim = 8, k = 1, nlist = 3,
      nprobe = 2).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(r.getAs[Long]("nbr_id") == exact(r.getAs[Long]("query_id")))
    }
  }

  test("IVF-PQ recall@1 on clustered data; ADC cosine tracks true cosine") {
    val q = corpus.filter($"vec_id" === 0L || $"vec_id" === 5L)
    val exact = SimSearch.bruteForceTopK(corpus, q, 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("nbr_id")).toMap
    // dim 8 → m=4 subspaces of 2 dims, ksub=4 codes; 3 coarse cells
    val pq = SimSearch.ivfPqTopK(corpus, q, dim = 8, k = 1, nlist = 3,
      nprobe = 2, m = 4, ksub = 4).collect()
    assert(pq.nonEmpty)
    pq.foreach { r =>
      assert(r.getAs[Long]("nbr_id") == exact(r.getAs[Long]("query_id")))
      // quantized cosine of tight same-axis clusters stays high
      assert(r.getAs[Double]("adc_cos") > 0.8)
    }
  }

  test("IVF-PQ is deterministic under a fixed seed") {
    val q = corpus.filter($"vec_id" === 0L)
    def run() = SimSearch.ivfPqTopK(corpus, q, dim = 8, k = 3, nlist = 3,
      nprobe = 3, m = 4, ksub = 4).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("nbr_id"),
        r.getAs[Double]("adc_cos"))).toSeq
    assert(run() == run())
  }

  test("ivfTopK over a prebuilt inverted file matches the inline path") {
    val queries = corpus.filter(col("vec_id") < 2)
    val centers = SimSearch.ivfCentroids(corpus, nlist = 3)
    val index = SimSearch.ivfIndex(corpus, centers)
    // the index carries the expected shape for at-rest materialization
    assert(index.columns.toSeq == Seq("nbr_id", "v", "cell"))
    val viaIndex = SimSearch.ivfTopK(corpus, queries, dim = 8, k = 3,
        centersOpt = Some(centers), indexOpt = Some(index))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val inline = SimSearch.ivfTopK(corpus, queries, dim = 8, k = 3,
        centersOpt = Some(centers))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaIndex == inline && viaIndex.nonEmpty)
  }

  test("ivfPqTopK over a prebuilt PQ index matches the inline path") {
    val queries = corpus.filter(col("vec_id") < 2)
    val model = SimSearch.ivfPqModel(corpus, dim = 8, nlist = 3, m = 2,
      ksub = 4)
    val index = SimSearch.ivfPqIndex(corpus, dim = 8, m = 2, model)
    assert(index.columns.toSeq ==
      Seq("nbr_id", "cell", "c0", "c1", "recon_norm"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaIndex = rows(SimSearch.ivfPqTopK(corpus, queries, dim = 8,
      k = 3, m = 2, ksub = 4, modelOpt = Some(model),
      indexOpt = Some(index)))
    val inline = rows(SimSearch.ivfPqTopK(corpus, queries, dim = 8,
      k = 3, m = 2, ksub = 4, modelOpt = Some(model)))
    assert(viaIndex == inline && viaIndex.nonEmpty)
  }

  test("PQ refine stage: full probe + full refine equals brute force") {
    val queries = corpus.filter(col("vec_id") < 2)
    val model = SimSearch.ivfPqModel(corpus, dim = 8, nlist = 3, m = 2,
      ksub = 4)
    val refined = SimSearch.ivfPqTopK(corpus, queries, dim = 8, k = 3,
        nprobe = 3, m = 2, ksub = 4, modelOpt = Some(model),
        refine = 100)
      .select(col("query_id"), col("rank"), col("nbr_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = SimSearch.bruteForceTopK(corpus, queries, 3)
      .select(col("query_id"), col("rank"), col("nbr_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // every candidate survives the shortlist, so the exact re-rank IS
    // brute force — ADC quantization error cannot reorder the output
    assert(refined == brute && refined.nonEmpty)
  }

  test("ivfAppendReport: frozen-centroid assignment, exact drift, " +
      "retrain trips only when the batch moves mass") {
    val centers = SimSearch.ivfCentroids(corpus, nlist = 3)
    val index = SimSearch.ivfIndex(corpus, centers)
      .select(col("nbr_id"), col("cell"))
    // batch drawn from the same clusters: drift stays near zero
    def vec(axis: Int, scale: Float): Seq[Float] =
      Seq.tabulate(8)(i => if (i == axis) scale else 0.01f * ((i + axis) % 3))
    val sameBatch = Seq((10L, vec(0, 0.95f)), (11L, vec(3, 0.9f)),
      (12L, vec(6, 1.05f))).toDF("vec_id", "embedding")
    val same = SimSearch.ivfAppendReport(index, sameBatch, centers,
      retrainTv = 0.2)
    val sameRows = same.collect()
    assert(sameRows.forall(!_.getAs[Boolean]("retrain")),
      "balanced batch must not trigger retrain")
    // n_total accounting: index 7 + batch 3
    assert(sameRows.map(_.getAs[Long]("n_total")).sum == 10L)
    // a batch dumped entirely into ONE cell shifts mass: retrain trips
    val skewBatch = (20L to 27L).map(i => (i, vec(0, 1.0f)))
      .toDF("vec_id", "embedding")
    val skew = SimSearch.ivfAppendReport(index, skewBatch, centers,
      retrainTv = 0.2).collect()
    assert(skew.forall(_.getAs[Boolean]("retrain")),
      "skewed batch must trigger retrain")
    // drift is a table-level constant, identical on every row
    assert(skew.map(_.getAs[Double]("drift_tv")).distinct.length == 1)
    // exact arithmetic sanity: same-distribution batch has LOWER drift
    assert(sameRows.head.getAs[Double]("drift_tv") <
      skew.head.getAs[Double]("drift_tv"))
  }

  test("IVF candidate set is cell-bounded: nprobe=nlist degrades to exact") {
    val q = corpus.filter($"vec_id" === 3L)
    val exact = SimSearch.bruteForceTopK(corpus, q, 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("nbr_id")))
    val ivf = SimSearch.ivfTopK(corpus, q, dim = 8, k = 3, nlist = 3,
      nprobe = 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("nbr_id")))
    assert(ivf.sorted.sameElements(exact.sorted))
  }
}
