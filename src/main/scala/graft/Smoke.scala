package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's flagship check: SparkEntry.entry must
  * return rows on sf0.001. Prints schema, row count, and a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_SCHEMA=" + df.schema.simpleString)
    val rows = df.collect()
    println("ENTRY_ROWS=" + rows.length)
    println("ENTRY_SAMPLE=" + rows.take(3).mkString("; "))
    spark.stop()
  }
}
