package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev-only; the driver passes two): comma-
    // separated substrings — dump only matching queries, e.g. to re-check
    // one query against a previous full dump
    val only: String => Boolean =
      if (args.length > 2) {
        val subs = args(2).split(",").toSeq
        name => subs.exists(name.contains)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(p => only(p._1)).foreach { case (name, fn) =>
      // per-query pin scope: the query's result is materialized by the
      // write, then the operator-internal cache pins it registered drop
      // at scope exit, so a 90-query dump doesn't accumulate LSH/gram
      // tables (memoized cross-query tables live in SparkEntry's dfMemo,
      // not here)
      graft.util.Pins.scoped {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // a failed query must go RED, not vanish: leave a marker the
          // correctness gate can surface as an err row (r07: q81's
          // failure was invisible — absent from CORRECTNESS_r07.json)
          new java.io.File(s"$outDir/$name").mkdirs()
          Files.writeString(Paths.get(s"$outDir/$name/_ERROR"),
            s"$name\n${Option(e.getMessage).getOrElse(e.getClass.getName)}\n")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // filtered dev runs must NOT rewrite oracle_sql.json: the ANN oracles
    // (q40/q50/q69) are generated from quantizers trained by running those
    // queries, so a partial run would drop their entries from the file
    if (args.length == 2) {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
