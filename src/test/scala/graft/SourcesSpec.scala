package graft

import java.nio.file.Files
import graft.sources.Sources

/** S1-S4 scan operators on temp files shaped like the reference's inputs. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-src").toFile
    d.deleteOnExit()
    val f = new java.io.File(d, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("S1: edge CSV with header → canonical edge table") {
    val p = tmpFile("edges.csv",
      "Source,Destination,Weight,Timestamp\n1,2,10,0\n2,3,5,7\n")
    val got = Sources.edgeCsv(spark, p)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 10L, 0L), (2L, 3L, 5L, 7L)))
  }

  test("S2: dense matrix text → sparse COO of the 1-cells") {
    val p = tmpFile("m.txt", "0 1 0\n0 0 1\n1 0 0\n")
    val got = Sources.denseMatrix(spark, p)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (1L, 2L), (2L, 0L)))
  }

  test("S2: float-formatted cells (np.savetxt default) parse too") {
    val p = tmpFile("m.txt", "0.0 1.0\n1.0 0.0\n")
    val got = Sources.denseMatrix(spark, p)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (1L, 0L)))
  }

  test("S3: semicolon CSV projects 5 cols and drops null rows") {
    val p = tmpFile("trans.csv",
      "trans_id;account_id;date;type;operation;amount;balance;k_symbol;bank;account\n" +
      "1;10;100;PRIJEM;PREVOD Z UCTU;500.0;1000.0;;AB;20\n" +
      "2;11;101;VYDAJ;PREVOD NA UCET;200.0;800.0;;CD;21\n" +
      "3;12;102;PRIJEM;VKLAD;100.0;900.0;;;\n") // null account → dropped
    val got = Sources.transCsv(spark, p).collect()
    assert(got.length == 2)
    assert(got.head.schema.fieldNames.toSeq ==
      Seq("account_id", "date", "operation", "amount", "account"))
  }

  test("JSONL docs: schema-explicit scan projects knowns, ignores extras") {
    val p = tmpFile("docs.jsonl",
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "crawl_date": "2024-01-01"}
        |{"doc_id": 2, "text": "bonjour", "source": "s1"}
        |""".stripMargin)
    val got = Sources.jsonlDocs(spark, p)
      .orderBy($"doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getString(1) == "hello world"
      && got(0).getString(2) == "en" && got(0).getString(3) == "s0")
    // missing optional field → null, unknown field → not projected
    assert(got(1).isNullAt(2) && got(1).getString(3) == "s1")
  }

  test("S4: direction rule — Z UCTU reverses, set-dedup applies") {
    val trans = Seq(
      (10L, 100L, "PREVOD Z UCTU", 5.0, 20L),  // money FROM 20 → (20, 10)
      (11L, 101L, "PREVOD NA UCET", 2.0, 21L), // money TO 21   → (11, 21)
      (10L, 102L, "PREVOD Z UCTU", 9.0, 20L),  // dup of (20, 10)
      (12L, 103L, "VKLAD", 1.0, 22L)           // filtered out
    ).toDF("account_id", "date", "operation", "amount", "account")
    val got = Sources.directedEdges(trans)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((20L, 10L), (11L, 21L)))
  }
}
