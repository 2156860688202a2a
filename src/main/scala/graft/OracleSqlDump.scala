package graft

/** Dev tool: dump each SparkEntry.oracleSql entry to `<outDir>/<name>.sql`
  * so a mirror can be iterated in DuckDB directly (the stashed-literal
  * oracles — q40/q50/q69/q84-q87 — are generated at query run time and are
  * NOT emitted here; run Verify for those). Usage:
  * `runMain graft.OracleSqlDump <outDir> [nameSubstring...]`
  */
object OracleSqlDump {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(out)
    val subs = args.drop(1)
    SparkEntry.oracleSql
      .filter { case (k, _) => subs.isEmpty || subs.exists(k.contains) }
      .foreach { case (k, v) =>
        java.nio.file.Files.writeString(out.resolve(s"$k.sql"), v + "\n")
      }
  }
}
