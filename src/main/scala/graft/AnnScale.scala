package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.SimSearch

/** Corpus-scale ANN run record — the similarity-search companion to
  * [[ArScale]]/[[SmurfScale]] (dev tool, run manually; results recorded
  * in README).
  *
  * The sf0.1 testdata carries 5k embeddings; this main synthesizes a
  * deterministic clustered corpus 200× that (default 1M × 64 dims:
  * 65,536 small latent clusters — ~15 true neighbors per query among
  * distinguishable strangers — vectors = cluster center + 0.15 noise,
  * both derived from the sine-fract hash so the same id yields the same
  * vector anywhere, no RNG state), then times the full ANN lifecycle at
  * that scale on the same operators q40/q50/q69/q87 hash-check:
  * quantizer train (bounded sample, driver-local k-means, self-scaled
  * nlist), one-time inverted-file build, IVF search for a query batch,
  * brute-force ground truth over the whole corpus, recall@10 against
  * that truth, the PQ lifecycle (model train, PQ-index build, ADC-only
  * search, ADC + exact-refine search) with recalls, and a full-corpus
  * SemDeDup pass over a denser dedup quantizer.
  *
  * Prints one JSON line with all the timings and recalls.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dims = 64
    // ~15 members per latent cluster: queries have a SMALL set of true
    // near neighbors (their siblings) among many distinguishable
    // strangers — the shape real embedding corpora have. Few huge
    // clusters of iid noise would instead make every member
    // exchangeable, and recall@10 against exact truth would measure
    // codebook resolution, not search quality.
    val latent = 65536
    val nQueries = 100
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic uniform in [-1, 1): the sine-fract hash — pure
    // codegen arithmetic, no per-row RNG state to coordinate across
    // partitions, same (a, b) → same value in any engine or layout
    def u(a: Column, b: Column): Column = {
      val s = sin(a * 12.9898 + b * 78.233) * 43758.5453
      (s - floor(s)) * 2.0 - 1.0
    }
    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    val tGen = t0()
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), i => {
        val c = pmod(col("id"), lit(latent)).cast("double")
        (u(c * 1.61803 + 0.5, i.cast("double")) +
          lit(0.15) * u(col("id").cast("double") * 1.000173 + 7.77,
            i.cast("double") + 31.0)).cast("float")
      }).as("embedding"))
      .persist()
    emb.count()
    val genSec = secs(tGen)

    val tTrain = t0()
    val centers = SimSearch.ivfCentroids(emb)
    val trainSec = secs(tTrain)

    // the inverted file materializes ONCE (a deployment writes it
    // bucketed by cell); per-batch search must not pay the O(n·nlist·dim)
    // assignment again
    val tBuild = t0()
    val index = SimSearch.ivfIndex(emb, centers).persist()
    index.count()
    val buildSec = secs(tBuild)

    val queries = emb.filter(col("vec_id") < nQueries)
    val tIvf = t0()
    val ivf = SimSearch.ivfTopK(emb, queries, dim = dims, k = k,
        centersOpt = Some(centers), indexOpt = Some(index))
      .select(col("query_id"), col("nbr_id")).persist()
    ivf.count()
    val ivfSec = secs(tIvf)

    val tBrute = t0()
    val truth = SimSearch.bruteForceTopK(emb, queries, k)
      .select(col("query_id"), col("nbr_id")).persist()
    truth.count()
    val bruteSec = secs(tBrute)

    val recall = truth.join(ivf, Seq("query_id", "nbr_id"), "left_semi")
      .count().toDouble / (nQueries.toDouble * k)

    // ───── incremental append lifecycle (round 15 — q153 at corpus
    // scale): 90 % of the corpus trains the quantizer and builds the
    // index; the arriving 10 % batch assigns against the FROZEN
    // centroids (map-only), the drift report decides retrain, and
    // search over the appended index must hold recall — the production
    // maintenance loop between retrains
    val existing = emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0)
    val arriving = emb.filter(pmod(col("vec_id"), lit(10L)) === 0)
    val tTrain90 = t0()
    val centers90 = SimSearch.ivfCentroids(existing)
    val train90Sec = secs(tTrain90)
    val index90 = SimSearch.ivfIndex(existing, centers90).persist()
    index90.count()
    val tAppend = t0()
    val repRow = SimSearch.ivfAppendReport(
        index90.select(col("nbr_id"), col("cell")), arriving, centers90)
      .select(col("drift_tv"), col("retrain")).first()
    val appendSec = secs(tAppend)
    val appended = index90
      .unionByName(SimSearch.ivfIndex(arriving, centers90)).persist()
    appended.count()
    val tIvfApp = t0()
    val ivfApp = SimSearch.ivfTopK(emb, queries, dim = dims, k = k,
        centersOpt = Some(centers90), indexOpt = Some(appended))
      .select(col("query_id"), col("nbr_id")).persist()
    ivfApp.count()
    val ivfAppSec = secs(tIvfApp)
    val recallApp = truth.join(ivfApp, Seq("query_id", "nbr_id"),
      "left_semi").count().toDouble / (nQueries.toDouble * k)

    // the memory-bound path: PQ-encode the corpus once (the at-rest
    // index is m codes + a norm per vector — no float vectors), then
    // ADC-scan the same query batch
    val tPqTrain = t0()
    val model = SimSearch.ivfPqModel(emb, dim = dims)
    val pqTrainSec = secs(tPqTrain)
    val tPqBuild = t0()
    val pqIndex = SimSearch.ivfPqIndex(emb, dim = dims, model = model)
      .persist()
    pqIndex.count()
    val pqBuildSec = secs(tPqBuild)
    val tPq = t0()
    val pq = SimSearch.ivfPqTopK(emb, queries, dim = dims, k = k,
        modelOpt = Some(model), indexOpt = Some(pqIndex))
      .select(col("query_id"), col("nbr_id")).persist()
    pq.count()
    val pqSec = secs(tPq)
    val recallPq = truth.join(pq, Seq("query_id", "nbr_id"), "left_semi")
      .count().toDouble / (nQueries.toDouble * k)

    // ADC shortlist + exact re-rank (refine = 10·k): the standard
    // two-stage PQ deployment — full vectors touched only for the
    // shortlist
    val tPqR = t0()
    val pqR = SimSearch.ivfPqTopK(emb, queries, dim = dims, k = k,
        modelOpt = Some(model), indexOpt = Some(pqIndex),
        refine = 10 * k)
      .select(col("query_id"), col("nbr_id")).persist()
    pqR.count()
    val pqRSec = secs(tPqR)
    val recallPqR = truth.join(pqR, Seq("query_id", "nbr_id"), "left_semi")
      .count().toDouble / (nQueries.toDouble * k)

    // SemDeDup over the full corpus: dedup wants a much denser
    // quantizer than search (within-cell pairwise work is n²/nlist —
    // 125 search cells would mean 8G cosine pairs at 1M rows; 1024
    // cells ≈ 1G). The cell assignment rides the same native fused
    // loops as the IVF index build.
    val tSemTrain = t0()
    val semCenters = SimSearch.ivfCentroids(emb, nlist = 1024)
    val semTrainSec = secs(tSemTrain)
    val tSem = t0()
    val semKept = graft.ext.Dedup.semDedup(emb, semCenters,
      minCos = 0.95).filter(col("keep")).count()
    val semSec = secs(tSem)

    println(s"""{"n":$n,"dims":$dims,"nlist":${centers.length},""" +
      s""""gen_sec":$genSec,"train_sec":$trainSec,""" +
      s""""index_build_sec":$buildSec,"ivf_search_sec":$ivfSec,""" +
      s""""brute_sec":$bruteSec,"recall_ivf":$recall,""" +
      s""""append_train_sec":$train90Sec,""" +
      s""""append_assign_sec":$appendSec,""" +
      s""""append_drift_tv":${repRow.getDouble(0)},""" +
      s""""append_retrain":${repRow.getBoolean(1)},""" +
      s""""append_search_sec":$ivfAppSec,""" +
      s""""recall_ivf_appended":$recallApp,""" +
      s""""pq_train_sec":$pqTrainSec,"pq_index_sec":$pqBuildSec,""" +
      s""""pq_search_sec":$pqSec,"recall_ivfpq_adc":$recallPq,""" +
      s""""pq_refine_search_sec":$pqRSec,""" +
      s""""recall_ivfpq_refined":$recallPqR,""" +
      s""""sem_train_sec":$semTrainSec,"sem_nlist":${semCenters.length},""" +
      s""""semdedup_sec":$semSec,"sem_kept":$semKept,""" +
      s""""queries":$nQueries}""")
    spark.stop()
  }
}
