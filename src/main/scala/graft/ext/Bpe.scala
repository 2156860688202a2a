package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — the tokenizer-training stage
  * of a pretraining data pipeline, run as a distributed corpus pass plus
  * vocab-table merge rounds.
  *
  * Scale design (the classic BPE-trainer factoring): ONE corpus scan
  * builds the word-frequency table (`groupBy word`), and every merge
  * round thereafter runs on that vocab-size table — pair counting,
  * argmax, and merge application never touch the corpus again. At 100 TB
  * the corpus scan is the only big job; the per-round jobs aggregate a
  * table bounded by |vocab|, and the chosen merges become plan literals
  * (the q40/q50 trained-quantizer convention), so ENCODING the corpus is
  * a map-only projection that never shuffles.
  *
  * Engine-portable by construction, so the whole trainer replays in SQL:
  *   - a word's symbol state is a space-joined string `" a b c "`
  *     (leading + trailing space), built with `regexp_replace(word,
  *     "(.)", " $1") || " "` — identical in Spark and DuckDB;
  *   - one merge applies as a literal, non-overlapping, left-to-right
  *     string `replace(s, " l r ", " lr ")`. Java's `String.replace`,
  *     Spark's `StringReplace`, and DuckDB's `replace` all share exactly
  *     that semantics — including the continuation-after-replacement
  *     corner (`" a a a a "` merges ONE `(a,a)` pair per round because
  *     the match consumes the shared separator; BpeSpec pins it). This is
  *     a documented variant of textbook BPE chosen because every engine
  *     agrees on it bit-for-bit;
  *   - the winning pair per round is `ORDER BY cnt DESC, l, r LIMIT 1` —
  *     ASCII lexicographic ties, identical across engines.
  *
  * Only `[a-z]+` tokens participate (the corpus alphabet); anything else
  * is out-of-vocabulary by contract, mirroring real trainers' pre-
  * tokenization split. Reference context: the reference repo has no
  * tokenizer stage (its pipelines are graph-numeric); this operator is
  * part of the training-data extension surface (SURVEY §2.12).
  */
object Bpe {

  /** Pre-tokenization contract: which corpus tokens participate. The
    * default covers the testdata corpus alphabet; callers with other
    * alphabets pass their own anchored class (symbols must never contain
    * a space — the separator — which any `^[…]+$` character class
    * guarantees).
    */
  val WordPattern = "^[a-z]+$"

  /** One merge decision: at `step` (1-based), the corpus-weighted most
    * frequent adjacent symbol pair was (`lhs`, `rhs`) with `cnt`
    * occurrences; the merged symbol is `lhs + rhs`.
    */
  final case class Merge(step: Int, lhs: String, rhs: String, cnt: Long)

  /** Initial symbol state for a word: `" a b c "`. */
  def symbolState(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1"), lit(" "))

  /** BYTE-LEVEL initial state: every UTF-8 byte of the word becomes one
    * two-hex-digit symbol — `"né"` → `" 6E C3 A9 "`. Nothing is ever
    * out-of-vocabulary (digits, punctuation, any script — the reason
    * real tokenizers are byte-level), and the space-separated replace
    * idiom survives unchanged because hex symbols (and their merged
    * concatenations) never contain the separator. Engine-portable:
    * Spark's `hex(encode(w, 'UTF-8'))` and DuckDB's `hex(encode(w))`
    * both emit uppercase hex of the UTF-8 bytes.
    */
  def symbolStateBytes(word: Column): Column =
    concat(regexp_replace(hex(encode(word, "UTF-8")), "(..)", " $1"),
      lit(" "))

  /** One merge applied to a symbol state (see class doc for semantics). */
  def applyMerge(s: Column, lhs: String, rhs: String): Column =
    replace(s, lit(s" $lhs $rhs "), lit(s" $lhs$rhs "))

  /** All of `merges` applied in order — a pure column expression, usable
    * in a map-only corpus projection.
    */
  def applyMerges(s: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(s)((acc, m) => applyMerge(acc, m.lhs, m.rhs))

  /** Token count of a word under `merges`: symbols remaining after all
    * merges. `split` on the single-space separator after `trim` — the
    * state never contains doubled spaces.
    */
  def tokenCount(word: Column, merges: Seq[Merge]): Column =
    size(split(trim(applyMerges(symbolState(word), merges)), " "))
      .cast("long")

  /** Token count of a word under BYTE-LEVEL `merges` — total by
    * construction (every UTF-8 byte starts as a symbol, so no word is
    * OOV; BpeSpec pins digits/punctuation/non-ASCII).
    */
  def tokenCountBytes(word: Column, merges: Seq[Merge]): Column =
    size(split(trim(applyMerges(symbolStateBytes(word), merges)), " "))
      .cast("long")

  /** The ONE corpus-scale pass: word → corpus frequency. Partial
    * aggregation collapses each task to its distinct words before the
    * (vocab-keyed) shuffle.
    */
  def wordFrequencies(docs: DataFrame, textCol: String = "text",
      wordPattern: String = WordPattern): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word").rlike(wordPattern))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Corpus-weighted adjacent-pair counts over symbol states `s`. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val arr = split(trim(col("s")), " ")
    words
      .select(col("freq"), arr.as("a"))
      // single-symbol words carry no pairs (and sequence(1, 0) would
      // descend — never build it)
      .filter(size(col("a")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), size(col("a")) - 1),
          i => struct(element_at(col("a"), i).as("l"),
            element_at(col("a"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Learn `numMerges` merges from a word-frequency table. Each round is
    * one aggregation over the vocab-size table plus a single-row collect
    * (the argmax is inherently global and sequential — the standard
    * trainer shape; the corpus is never rescanned). Stops early if no
    * adjacent pairs remain.
    */
  def learnMerges(wordFreq: DataFrame, numMerges: Int,
      state: Column => Column = symbolState): Seq[Merge] = {
    val base = wordFreq.select(col("word"), col("freq"),
      state(col("word")).as("s"))
    val merges = Seq.newBuilder[Merge]
    var cur = base
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val row = top.head
        val m = Merge(step, row.getString(0), row.getString(1),
          row.getLong(2))
        merges += m
        // chain the replace as an expression over the base state: eight
        // literal replaces over a vocab-size table beat eight cached
        // intermediates
        val ms = merges.result()
        cur = base.withColumn("s", applyMerges(col("s"), ms))
        step += 1
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (q91's face). */
  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.step, m.lhs, m.rhs, m.lhs + m.rhs, m.cnt))
      .toDF("step", "lhs", "rhs", "merged", "pair_cnt")
  }

  /** Map-only corpus encode (q92's face): per document, the number of
    * participating words and their total BPE token count under `merges`.
    * No explode, no join, no shuffle — one projection with the merges as
    * literals, the shape that streams a 100 TB corpus scan → sink.
    */
  def encodeTokenCounts(docs: DataFrame, merges: Seq[Merge],
      textCol: String = "text",
      wordPattern: String = WordPattern): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"),
      w => w.rlike(wordPattern))
    docs.select(col("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L),
        (acc, w) => acc + tokenCount(w, merges)).as("n_bpe_tokens"))
  }

  // ───────────────────────── DuckDB oracle ─────────────────────────

  /** Unrolled merge-round CTEs (the SmurfSql idiom: MATERIALIZED so the
    * twice-referenced state never inlines exponentially). `w{k}` is the
    * vocab table after k merges; `m{k}` is round k's winning pair (empty
    * if none remained — the null-guarded replace then leaves state
    * untouched, matching the trainer's early stop).
    */
  def mergeCtes(numMerges: Int, docsRel: String = "documents"): String =
    mergeCtesFrom(numMerges,
      s"""w0 AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
      |    regexp_replace(word, '(.)', ' \\1', 'g') || ' ' AS s
      |  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word
      |        FROM $docsRel)
      |  WHERE regexp_matches(word, '^[a-z]+$$')
      |  GROUP BY word
      |)""".stripMargin)

  /** Byte-level w0: hex-pair symbol states over ALL non-empty tokens of
    * `corpusExpr` (an expression over `docsRel`'s columns) — the
    * [[symbolStateBytes]] alphabet, nothing OOV.
    */
  def byteW0(corpusExpr: String, docsRel: String = "documents"): String =
    s"""w0 AS MATERIALIZED (
    |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
    |    regexp_replace(hex(encode(word)), '(..)', ' \\1', 'g') || ' ' AS s
    |  FROM (SELECT unnest(string_split_regex($corpusExpr, '\\s+')) AS word
    |        FROM $docsRel)
    |  WHERE word <> ''
    |  GROUP BY word
    |)""".stripMargin

  /** Unrolled merge-round CTEs over an arbitrary `w0` state table. */
  def mergeCtesFrom(numMerges: Int, w0: String): String = {
    val sb = new StringBuilder
    sb ++= w0
    for (k <- 1 to numMerges) {
      val prev = s"w${k - 1}"
      sb ++= s""",
      |p$k AS MATERIALIZED (
      |  SELECT arr[u.i] AS l, arr[u.i + 1] AS r,
      |    CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM (SELECT freq, string_split(trim(s, ' '), ' ') AS arr
      |        FROM $prev) t,
      |    unnest(range(1, len(t.arr))) AS u(i)
      |  GROUP BY 1, 2
      |),
      |m$k AS MATERIALIZED (
      |  SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1
      |),
      |w$k AS MATERIALIZED (
      |  SELECT word, freq,
      |    replace(s,
      |      coalesce((SELECT ' ' || l || ' ' || r || ' ' FROM m$k), chr(1)),
      |      coalesce((SELECT ' ' || l || r || ' ' FROM m$k), chr(1))) AS s
      |  FROM $prev
      |)""".stripMargin
    }
    sb.result()
  }

  /** q91 oracle: the merge table, derived entirely in SQL. */
  def q91Sql(numMerges: Int): String = {
    val union = (1 to numMerges)
      .map(k => s"SELECT $k AS step, l, r, cnt FROM m$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${mergeCtes(numMerges)}
       |SELECT step, l AS lhs, r AS rhs, l || r AS merged,
       |  cnt AS pair_cnt
       |FROM ($union)""".stripMargin
  }

  /** q113 oracle: the BYTE-LEVEL merge table over `corpusExpr` —
    * identical trainer replay, byte alphabet.
    */
  def q113Sql(numMerges: Int, corpusExpr: String): String = {
    val union = (1 to numMerges)
      .map(k => s"SELECT $k AS step, l, r, cnt FROM m$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${mergeCtesFrom(numMerges, byteW0(corpusExpr))}
       |SELECT step, l AS lhs, r AS rhs, l || r AS merged,
       |  cnt AS pair_cnt
       |FROM ($union)""".stripMargin
  }

  /** q97 oracle: the actual token STREAM (doc_id, tok_idx, token) via
    * the final vocab state — per-document positional order rebuilt from
    * word index × symbol index (no WITH ORDINALITY in DuckDB; the
    * `unnest(range(...))` + `arr[i]` indexing is the mergeCtes idiom).
    * Documents with no participating words emit no rows in BOTH engines
    * (inner join here, empty flatten → no posexplode rows in Spark).
    */
  def q97Sql(numMerges: Int): String =
    s"""WITH ${mergeCtes(numMerges)},
       |dw AS (
       |  SELECT doc_id, arr[u.i] AS word, u.i AS idx
       |  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS arr
       |        FROM documents) t,
       |       unnest(range(1, len(t.arr) + 1)) AS u(i)
       |  WHERE regexp_matches(arr[u.i], '^[a-z]+$$')
       |),
       |wt AS (
       |  SELECT word, string_split(trim(s, ' '), ' ') AS toks
       |  FROM w$numMerges
       |),
       |tok AS (
       |  SELECT dw.doc_id, dw.idx AS widx, wt.toks[v.j] AS tok,
       |    v.j AS sidx
       |  FROM dw JOIN wt USING (word),
       |       unnest(range(1, len(wt.toks) + 1)) AS v(j)
       |)
       |SELECT doc_id,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
       |    AS tok_idx,
       |  tok AS token
       |FROM tok""".stripMargin

  /** q92 oracle: per-doc token counts via the final vocab state. The SQL
    * path joins exploded words to the vocab table (every corpus word is
    * in w0 by construction); the LEFT JOIN keeps all-out-of-vocabulary
    * docs at zero, matching the map-only face.
    */
  def q92Sql(numMerges: Int): String =
    s"""WITH ${mergeCtes(numMerges)},
       |dw AS (
       |  SELECT doc_id, word FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(text, '\\s+')) AS word
       |    FROM documents)
       |  WHERE regexp_matches(word, '^[a-z]+$$')
       |),
       |vlen AS (
       |  SELECT word,
       |    CAST(len(string_split(trim(s, ' '), ' ')) AS BIGINT) AS tok_len
       |  FROM w$numMerges
       |),
       |agg AS (
       |  SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(v.tok_len) AS BIGINT) AS n_bpe_tokens
       |  FROM dw JOIN vlen v USING (word)
       |  GROUP BY dw.doc_id
       |)
       |SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
       |  coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
}
