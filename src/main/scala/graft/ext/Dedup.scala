package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star
  * extension surface): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup. Every variant is expressed as joins +
  * aggregations over exploded token/shingle/band tables — the shapes that
  * scale horizontally: no pairwise n² work except *within* LSH buckets.
  */
object Dedup {

  /** Word n-gram shingles of a text column (lowercased, whitespace
    * tokenized). Distinct per doc.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    // guard: sequence(0, negative) would be DESCENDING in Spark, so short
    // docs get an empty shingle set instead of a broken slice
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: group by the full text, keep the smallest doc_id as the
    * canonical representative. At scale, group by a 128-bit hash of the
    * text instead of the text itself to shrink shuffle width — md5 here
    * (collision-safe at any realistic corpus size).
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
           count(lit(1)).as("n_dups"))

  /** MinHash signature: k seeded xxhash64 functions, min over shingles.
    * Returned as array<bigint> of length k. Pure column expressions.
    */
  def minhashSignature(sh: Column, k: Int = 32, seed: Int = 0): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i, lit(seed)))))

  /** MinHash + LSH banding: signatures of k hashes split into `bands`
    * bands of k/bands rows; docs sharing any band bucket are candidate
    * near-duplicates. Returns candidate pairs (doc_a < doc_b) with their
    * exact shingle-Jaccard similarity for verification — the LSH join
    * itself never does n² work: it's a self-join keyed on
    * (band_id, band_hash).
    */
  def minhashLshPairs(docs: DataFrame, textCol: String = "text",
                      k: Int = 32, bands: Int = 8,
                      minJaccard: Double = 0.5): DataFrame = {
    val rows = k / bands
    val withSig = docs.select(col("doc_id"),
        shingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = withSig.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows))), b)))
        .as(Seq("band_id", "band_hash")))
    val a = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("band_id"), col("band_hash"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard", jaccardArrays(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard of two (distinct-element) arrays. */
  def jaccardArrays(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** SimHash: 64-bit signature — for each bit, sign of the sum over tokens
    * of ±1 according to that bit of the token's hash. Near-dups have small
    * Hamming distance. Computed per doc with one explode + aggregation;
    * the bit loop is a 64-element higher-order transform, no UDF.
    */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    // per bit: count of tokens with bit set minus count with bit clear
    val bitCols = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(shiftleft(lit(1L), b)) =!= 0L, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** N-gram Jaccard near-dup: candidate pairs = docs sharing ≥ 1 shingle
    * (inverted-index self-join, linear in Σ shingles), then exact Jaccard
    * from co-occurrence counts — |A∩B| from the join, |A|,|B| from per-doc
    * shingle counts. No arrays are carried through the shuffle.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text", n: Int = 3,
                        minJaccard: Double = 0.1): DataFrame = {
    val docSh = docs.select(col("doc_id"),
        explode(shingles(col(textCol), n)).as("sh"))
    val sizes = docSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh")) // shingles are distinct per doc
    val co = docSh.alias("x")
      .join(docSh.alias("y"), col("x.sh") === col("y.sh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
        col("n_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dup via random-hyperplane LSH: bucket by the
    * sign-bit signature of `planes` random projections, compare only
    * within buckets. The plane normals are deterministic pseudo-random
    * values derived from xxhash64 — no driver-side state to broadcast.
    */
  def embeddingNearDupPairs(emb: DataFrame, dim: Int, planes: Int = 8,
                            minCos: Double = 0.95,
                            seed: Int = 0): DataFrame = {
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    // signature bit p = sign(Σ_i v_i · n_{p,i}), n from hash(p,i,seed)
    // mapped to [-1,1)
    val sig = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col("v"), sequence(lit(0), lit(dim - 1)),
          (x, i) => x * (pmod(xxhash64(lit(p), i, lit(seed)),
            lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_ + _)
    val withSig = e.withColumn("bucket", sig)
    val a = withSig.select(col("vec_id").as("id_a"), col("v").as("v_a"),
      col("bucket"))
    val b = withSig.select(col("vec_id").as("id_b"), col("v").as("v_b"),
      col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.ops.Scoring.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
