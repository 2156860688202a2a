package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Composed-pipeline scale record — runs the full `curate` CLI path
  * ([[Main.runCurate]]: exact dedup → PII scrub → Gopher filter →
  * decontamination → near-dup/representative → SemDeDup → per-language
  * token budget → sequence packing → mixture-epoch manifest) on ONE
  * synthetic corpus (default 1M docs) where every stage has a planted
  * family sized `n/100` and the per-stage survivor counts are EXACT
  * arithmetic, not statistics (dev tool, run manually; record in README).
  *
  * The six per-family harnesses (TextScale, AnnScale, MixScale, …) cover
  * each operator alone; composition is where cache-lifecycle and
  * shared-intermediate bugs hide — a stage that silently re-reads a
  * pruned intermediate, a persist freed while a later count still needs
  * it, a gate that merges families across stages. This main asserts the
  * whole chain's bookkeeping.
  *
  * Corpus design (all text deterministic sine-fract arithmetic — no RNG
  * state; every doc a pure function of its content key):
  *  - NORMAL docs: 50–200 tokens; content words uniform over a 50k-word
  *    vocabulary ("w<1..50000>"); every 7th position is a stopword from
  *    [[graft.ext.TextOps.stopwords]] cycling by position, so every
  *    normal doc passes the Gopher stopword rule by construction and no
  *    two stopwords are ever adjacent (every shingle keeps a
  *    doc-unique content word → no accidental near-dup pairs).
  *  - p = n/100 planted docs per family, ids packed at the top:
  *      [n−6p, n−5p): SEMDEDUP — normal text, but its EMBEDDING row is
  *                     byte-identical to partner id−(n−6p)+p (a normal
  *                     doc): same IVF cell, cos = 1 → exactly one of the
  *                     pair pruned at the semantic-dedup stage;
  *      [n−5p, n−4p): CONTAMINATED — normal text + a 6-token benchmark
  *                     sentence from a reserved vocab ("bmka…bmkf") that
  *                     also forms the 100-doc benchmark split → shares a
  *                     5-gram with it, dropped at decontamination;
  *      [n−4p, n−3p): PII — normal text + " contact user<id>@example.com
  *                     from 10.0.0.1" → the ONLY docs the scrub counts
  *                     (content words cannot match the email/IPv4/phone
  *                     shapes), scrubbed before every later stage;
  *      [n−3p, n−2p): DEGENERATE — one doc-unique token repeated 60×:
  *                     zero stopwords AND dup_token_frac 59/60 → fails
  *                     Gopher; unique text → NOT an exact duplicate;
  *      [n−2p, n−p):  EXACT copies of docs [0, p) → dropped at exact
  *                     dedup (canonical = the smaller id survives);
  *      [n−p, n):     NEAR copies of docs [0, p) — 5 % of CONTENT
  *                     positions re-drawn, position 0 unconditionally
  *                     (else P ≈ 0.95^len leaves short copies
  *                     byte-identical → they'd drop at exact dedup
  *                     instead) (stopword slots untouched):
  *                     3-gram Jaccard ≈ 0.74 ≫ the 0.05 near-dup gate,
  *                     each pair a 2-cluster → exactly one dropped.
  *    Partners for the semdedup family are ids [p, 2p) — disjoint from
  *    the near-dup originals [0, p) so no doc serves two plants.
  *  - All other embeddings: unique pseudo-random ±1 coords in 32 dims —
  *    P(|cos| ≥ 0.95) per pair ≈ (1−0.95²)^{(d−1)/2} ≈ 2e−16, so the
  *    ~n²/nlist within-cell comparisons yield zero accidental prunes.
  *
  * Asserted chain (exact unless noted):
  *    input = n;  pii_docs = p;  after_gopher = n − 2p;
  *    after_decontam = n − 3p;  after_dedup = n − 4p;
  *    after_semdedup = n − 5p;  0 < selected < after_semdedup (the
  *    budget BINDS) with per-language Σ n_tokens ≤ budget;
  *    packed rows = selected;  mixture manifest non-empty.
  *
  * The near-dup stage runs with the default df gate
  * ([[Main.runCurate]] `nearDupMaxDf = 50`): the planted PII family's
  * shared scrub-mask tail ("contact <EMAIL> from <IP>") alone puts a
  * df = p shingle in every PII doc — ungated, that one boilerplate
  * shingle is p² ≈ 10⁸ candidate pairs (all below the Jaccard gate:
  * pure wasted work); the gate drops it and keeps the planted pairs,
  * whose family-private shingles have df ≤ 2. Designing this harness is
  * what exposed the ungated call in `runCurate` (fixed same round) —
  * exactly the composition-level failure the per-family harnesses,
  * which each synthesize their own single-plant corpus, cannot see.
  *
  * Prints one JSON line with per-stage seconds, counts, and the asserted
  * deltas.
  */
object CurateScale {

  val vocab = 50000.0

  def u(a: Column, b: Column, c: Double): Column = {
    val s = sin(a * 12.9898 + b * 78.233 + c * 37.719) * 43758.5453
    s - floor(s)
  }
  def word(k: Column, pos: Column, salt: Double): Column =
    concat(lit("w"), (floor(u(k, pos, salt) * vocab) + 1).cast("long"))

  /** The planted corpus as a (doc_id, text) plan over spark.range(n) —
    * factored out so a debug probe can regenerate any id range
    * bit-identically.
    */
  def corpusText(n: Long): Column = {
    val p = n / 100
    val conLo = n - 5 * p; val piiLo = n - 4 * p
    val degLo = n - 3 * p; val exactLo = n - 2 * p; val nearLo = n - p
    val id = col("id")
    val key = when(id >= nearLo, id - nearLo)
      .when(id >= exactLo, id - exactLo).otherwise(id)
    val isNear = id >= nearLo
    val stopArr = array(graft.ext.TextOps.stopwords.map(lit): _*)
    val len = (lit(50) + floor(u(key, lit(-1.0), 1.0) * 150)).cast("int")
    val body = concat_ws(" ", transform(sequence(lit(0), len - 1), pos => {
      val pd = pos.cast("double")
      val isStop = pmod(pos, lit(7)) === 3
      val stopW = element_at(stopArr,
        (pmod(floor(pos / 7), lit(15)) + 1).cast("int"))
      // position 0 ALWAYS re-draws: the 5 % coin alone leaves a short doc
      // untouched with P = 0.95^content ≈ 0.11 at len 50 — those copies
      // collapse into byte-identical EXACT duplicates and shift a dozen
      // drops from the near-dup stage to exact dedup (observed −12/1000
      // on the first 100k smoke; the per-family deltas below are exact
      // only because every near copy is guaranteed to differ)
      val replaced = isNear && (u(key, pd, 3.0) < 0.05 || pos === 0)
      when(isStop, stopW)
        .when(replaced, word(key, pd, 9.0))
        .otherwise(word(key, pd, 0.0))
    }))
    when(id >= degLo && id < exactLo,
      concat_ws(" ",
        array_repeat(concat(lit("spam"), id.cast("string")), 60)))
    .when(id >= piiLo && id < degLo,
      concat(body, lit(" contact user"), id.cast("string"),
        lit("@example.com from 10.0.0.1")))
    .when(id >= conLo && id < piiLo,
      concat(body, lit(" bmka bmkb bmkc bmkd bmke bmkf")))
    .otherwise(body)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val p = n / 100
    require(n >= 100000, s"n=$n too small: need n >= 100000 (p = n/100)")
    val dim = 32
    val budget = 20000000L * n / 1000000L   // scale budget with n
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-curatescale")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    def dir(name: String): String = root.resolve(name).toString

    // family ranges (see scaladoc)
    val semLo = n - 6 * p; val conLo = n - 5 * p
    val id = col("id")
    val text = corpusText(n)

    def t0() = System.nanoTime()
    def secs(t: Long) = (System.nanoTime() - t) / 1e9

    val tGen = t0()
    spark.range(n).select(id.as("doc_id"), text.as("text"))
      .repartition(cpus.toInt * 2)
      .write.mode("overwrite").parquet(dir("docs"))
    // benchmark split: 100 held-out docs sharing the reserved sentence
    spark.range(100).select((id + 5000000L).as("doc_id"),
        concat(lit("eval item "), id.cast("string"),
          lit(" bmka bmkb bmkc bmkd bmke bmkf")).as("text"))
      .write.mode("overwrite").parquet(dir("bench"))
    // embeddings: the semdedup family copies its partner's vector
    val ekey = when(id >= semLo && id < conLo, id - semLo + p).otherwise(id)
    spark.range(n).select(id.as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => (u(ekey, j.cast("double"), 77.0) * 2.0 - 1.0).cast("float"))
          .as("embedding"))
      .write.mode("overwrite").parquet(dir("emb"))
    val genSec = secs(tGen)

    val tRun = t0()
    val counts = Main.runCurate(spark, dir("docs"), dir("out"),
      seqLen = 1024, tokenBudget = budget,
      benchPath = Some(dir("bench")), embPath = Some(dir("emb")),
      mixEpoch = true)
    val runSec = secs(tRun)

    // ── exact per-stage bookkeeping ──
    def expect(k: String, v: Long): Unit =
      assert(counts(k) == v, s"$k = ${counts(k)}, expected $v ($counts)")
    expect("input", n)
    expect("pii_docs", p)                 // only the PII family scrubs
    expect("after_gopher", n - 2 * p)     // −exact copies, −degenerate
    expect("after_decontam", n - 3 * p)   // −contaminated
    expect("after_dedup", n - 4 * p)      // −one per near pair
    expect("after_semdedup", n - 5 * p)   // −one per planted embedding pair
    val nSel = counts("selected")
    assert(nSel > 0 && nSel < counts("after_semdedup"),
      s"budget must bind: selected=$nSel of ${counts("after_semdedup")}")
    // the budget is respected per language on the landed table itself
    val overBudget = spark.read.parquet(dir("out") + "/selected")
      .groupBy(col("lang_pred")).agg(sum(col("n_tokens")).as("t"))
      .filter(col("t") > budget).count()
    assert(overBudget == 0, s"$overBudget languages exceed the token budget")
    val packedRows = spark.read.parquet(dir("out") + "/packed").count()
    assert(packedRows == nSel, s"packed rows $packedRows != selected $nSel")
    assert(counts("sequences") > 0 && counts("sequences") <= nSel)
    assert(counts("mixture_rows") > 0, "mixture manifest is empty")

    println(s"""{"n":$n,"planted_per_family":$p,"gen_sec":$genSec,""" +
      s""""curate_sec":$runSec,"budget_tokens":$budget,""" +
      counts.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")
    spark.stop()
  }
}
