package graft.util

/** Dev-only: write selected oracle SQLs to files so DuckDB replay cost
  * can be timed/diffed locally without a full Verify pass.
  * Usage: runMain graft.util.DumpSql <outDir> <substr> [<substr>...]
  */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(out)
    graft.SparkEntry.oracleSql
      .filter(p => args.drop(1).exists(p._1.contains))
      .foreach { case (n, s) =>
        java.nio.file.Files.writeString(out.resolve(n + ".sql"), s)
        println(s"wrote $n (${s.length} chars)")
      }
  }
}
