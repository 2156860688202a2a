package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** BPE vocabulary induction (ext.Bpe): the cross-engine replace contract,
  * hand-computed merge sequences, early stop, and the map-only encode.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("replace contract: one (a,a) merge per round on a run of a's") {
    // the separator-consuming continuation corner the Bpe scaladoc pins:
    // Java, Spark, and DuckDB all merge exactly ONE pair here per round
    assert(" a a a a ".replace(" a a ", " aa ") == " aa a a ")
    val got = spark.range(1)
      .select(Bpe.applyMerge(lit(" a a a a "), "a", "a").as("s"))
      .head().getString(0)
    assert(got == " aa a a ")
  }

  test("symbol state and token count round-trip") {
    val st = spark.range(1)
      .select(Bpe.symbolState(lit("abc")).as("s")).head().getString(0)
    assert(st == " a b c ")
    val n = spark.range(1)
      .select(Bpe.tokenCount(lit("abc"), Nil).as("n")).head().getLong(0)
    assert(n == 3L)
  }

  test("learnMerges reproduces a hand-computed sequence") {
    // corpus: "ab" ×3, "abc" ×2, "bc" ×1  (as word-frequency table)
    val wf = Seq(("ab", 3L), ("abc", 2L), ("bc", 1L)).toDF("word", "freq")
    val ms = Bpe.learnMerges(wf, 3)
    // round 1 pairs: (a,b) 3+2=5, (b,c) 2+1=3 → merge (a,b)
    assert(ms.head.lhs == "a" && ms.head.rhs == "b" && ms.head.cnt == 5L)
    // round 2: states " ab ", " ab c ", " b c " → (ab,c) 2, (b,c) 1
    assert(ms(1).lhs == "ab" && ms(1).rhs == "c" && ms(1).cnt == 2L)
    // round 3: only " b c " still has a pair
    assert(ms(2).lhs == "b" && ms(2).rhs == "c" && ms(2).cnt == 1L)
  }

  test("tie-break is (cnt desc, lhs, rhs) lexicographic") {
    // "ba" and "ab" each once: (a,b) and (b,a) tie at 1 → (a,b) wins
    val wf = Seq(("ba", 1L), ("ab", 1L)).toDF("word", "freq")
    val ms = Bpe.learnMerges(wf, 1)
    assert(ms.head.lhs == "a" && ms.head.rhs == "b")
  }

  test("byte-level state: hex-pair symbols, UTF-8 multibyte, nothing " +
      "OOV") {
    // "né" is 1 ASCII byte + the 2-byte UTF-8 of é (C3 A9): three
    // symbols, uppercase hex — the exact string DuckDB's
    // hex(encode(w)) yields, so the mirror replays the same states
    val st = spark.range(1)
      .select(Bpe.symbolStateBytes(lit("né")).as("s")).head().getString(0)
    assert(st == " 6E C3 A9 ")
    // digits and punctuation tokenize instead of dropping: "a1!" = 3
    // bytes = 3 tokens under no merges
    val n = spark.range(1)
      .select(Bpe.tokenCountBytes(lit("a1!"), Nil).as("n"))
      .head().getLong(0)
    assert(n == 3L)
    // the trainer runs the same replace idiom on the byte alphabet:
    // corpus "née" ×2 → state " 6E C3 A9 65 ", pairs (6E,C3), (C3,A9),
    // (A9,65) all cnt 2 → lexicographic tie-break: "6E" < "A9" < "C3"
    val wf = Seq(("née", 2L)).toDF("word", "freq")
    val ms = Bpe.learnMerges(wf, 2, Bpe.symbolStateBytes)
    assert(ms.head.lhs == "6E" && ms.head.rhs == "C3" &&
      ms.head.cnt == 2L)
    // round 2 state " 6EC3 A9 65 ": (6EC3,A9) vs (A9,65), tie →
    // '6' < 'A' lexicographic → (6EC3,A9)
    assert(ms(1).lhs == "6EC3" && ms(1).rhs == "A9")
    val tc = spark.range(1)
      .select(Bpe.tokenCountBytes(lit("née"), ms).as("n"))
      .head().getLong(0)
    assert(tc == 2L) // 6EC3A9 + 65
  }

  test("early stop when no pairs remain") {
    val wf = Seq(("ab", 2L)).toDF("word", "freq")
    // one merge exhausts the only pair; round 2 finds nothing
    val ms = Bpe.learnMerges(wf, 5)
    assert(ms.size == 1)
  }

  test("encodeTokenCounts is exact on a hand corpus and skips non-words") {
    val docs = Seq(
      (1L, "ab ab abc"),   // with merge (a,b): 1 + 1 + 2 tokens
      (2L, "xyz 123 ab"),  // "123" out of vocabulary by contract
      (3L, "")             // no words at all
    ).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(1, "a", "b", 5L))
    val out = Bpe.encodeTokenCounts(docs, merges)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 4L)
    // "xyz" → 3 unmerged symbols, "ab" → 1 merged token
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 3L + 1L)
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 0L)
  }

  test("wordFrequencies is the one corpus-scale pass") {
    val docs = Seq((1L, "ab ab cd"), (2L, "cd!")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs).orderBy("word").collect()
    // "cd!" fails ^[a-z]+$ — out of vocabulary
    assert(wf.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ab", 2L), ("cd", 1L)))
  }

  test("merge application chain matches a per-word re-derivation") {
    // property-style: applying merges as chained replaces equals
    // re-deriving each word's final state symbol-by-symbol on the driver
    val words = Seq("state", "stream", "master", "batch", "aaaa", "a")
    val wf = words.map(w => (w, 1L)).toDF("word", "freq")
    val ms = Bpe.learnMerges(wf, 4)
    def driverState(w: String): String = {
      var s = " " + w.map(c => s"$c ").mkString
      ms.foreach(m => s = s.replace(s" ${m.lhs} ${m.rhs} ", s" ${m.lhs}${m.rhs} "))
      s
    }
    val got = wf.select(col("word"),
      Bpe.applyMerges(Bpe.symbolState(col("word")), ms).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach(w => assert(got(w) == driverState(w), s"word $w"))
  }

  test("token stream (q97 shape) is consistent with encodeTokenCounts") {
    val docs = Seq(
      (1L, "aa ab aa X99 b"),
      (2L, "abab abab"),
      (3L, "ZZ 42")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs)
    val ms = Bpe.learnMerges(wf, numMerges = 2)
    val words = filter(split(col("text"), "\\s+"),
      w => w.rlike(Bpe.WordPattern))
    val stream = docs.select(col("doc_id"),
        posexplode(flatten(transform(words, w =>
          split(trim(Bpe.applyMerges(Bpe.symbolState(w), ms)), " ")))))
      .toDF("doc_id", "pos", "token")
    // per-doc token totals equal the count face; positions are dense
    val counts = Bpe.encodeTokenCounts(docs, ms).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val byDoc = stream.collect().groupBy(_.getLong(0))
    counts.foreach { case (id, n) =>
      val rows = byDoc.getOrElse(id, Array.empty)
      assert(rows.length.toLong == n, s"doc $id stream/count mismatch")
      assert(rows.map(_.getInt(1)).sorted.toSeq == (0 until rows.length),
        s"doc $id positions not dense")
      // no token carries the separator and every token is non-empty
      rows.foreach(r => assert(r.getString(2).nonEmpty &&
        !r.getString(2).contains(" ")))
    }
    // the all-out-of-vocabulary doc emits no stream rows but a zero count
    assert(counts(3L) == 0L && !byDoc.contains(3L))
  }
}
