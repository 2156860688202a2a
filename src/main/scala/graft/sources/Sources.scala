package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's input scans (SURVEY §2.1, S1-S4), re-expressed as
  * schema-explicit Spark readers. No `inferSchema` on contract paths
  * (SURVEY §1.3) — inference is a full extra pass over the data and
  * non-deterministic under dirty rows.
  */
object Sources {

  /** S1 — CSV edge-list scan (`/root/reference/AA-AR.py:286-287`): one
    * header row, then 4 integer columns Source,Destination,Weight,
    * Timestamp. Output uses the engine's canonical names.
    */
  val edgeCsvSchema: StructType = StructType(Seq(
    StructField("Source", LongType, nullable = false),
    StructField("Destination", LongType, nullable = false),
    StructField("Weight", LongType, nullable = false),
    StructField("Timestamp", LongType, nullable = false)))

  def edgeCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(edgeCsvSchema).option("header", "true").csv(path)
      .select(col("Source").as("src"), col("Destination").as("dst"),
        col("Weight").as("weight"), col("Timestamp").as("ts"))

  /** S2 — dense 0/1 adjacency-matrix text scan (`AA-Smurf.py:190`
    * np.loadtxt): n lines × n space-separated cells. The dense picture is
    * an ENCODING (SURVEY §1.1); output is the sparse COO edge list
    * (row_idx, col_idx) of the 1-cells.
    *
    * Row index comes from RDD zipWithIndex — for a text source the
    * partition order follows file-split offsets, so indices equal line
    * numbers. Cells explode per line; a 100k-line × 100k-col matrix
    * (10^10 cells) never materializes densely — each task streams its
    * lines.
    */
  def denseMatrix(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.textFile(path).zipWithIndex()
      .toDF("line", "row_idx")
      .select(col("row_idx"),
        posexplode(split(trim(col("line")), "\\s+"))
          .as(Seq("col_idx", "cell")))
      .filter(col("cell").cast("double") =!= 0.0)
      .select(col("row_idx").cast("bigint").as("src"),
        col("col_idx").cast("bigint").as("dst"))
  }

  /** S3 — semicolon-CSV scan with column projection + null drop
    * (`smurf_generator.py:45`): the Czech `trans.csv` shape, keeping
    * (account_id, date, operation, amount, account).
    */
  val transCsvSchema: StructType = StructType(Seq(
    StructField("trans_id", LongType),
    StructField("account_id", LongType),
    StructField("date", LongType),
    StructField("type", StringType),
    StructField("operation", StringType),
    StructField("amount", DoubleType),
    StructField("balance", DoubleType),
    StructField("k_symbol", StringType),
    StructField("bank", StringType),
    StructField("account", LongType)))

  def transCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(transCsvSchema).option("header", "true")
      .option("sep", ";").csv(path)
      .select(col("account_id"), col("date"), col("operation"),
        col("amount"), col("account"))
      .na.drop()

  /** JSONL document scan — the de-facto interchange format of LLM
    * training corpora (one JSON object per line). Schema-explicit like
    * every contract reader (SURVEY §1.3 — no inference pass over the
    * corpus); unknown per-line fields are simply not projected, and
    * Spark's line-wise JSON source splits by file offset, so a 100 TB
    * JSONL directory scans with the same parallelism as CSV.
    */
  val jsonlDocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType),
    StructField("source", StringType)))

  def jsonlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(jsonlDocSchema).json(path)

  /** S4 — edge constructor with the transfer-direction rule
    * (`smurf_generator.py:50-55`): money flows FROM the counterparty for
    * 'PREVOD Z UCTU' (transfer from account), TO it otherwise; dedup via
    * distinct (the reference's Python set).
    */
  def directedEdges(trans: DataFrame): DataFrame =
    trans
      .filter(col("operation").isin("PREVOD Z UCTU", "PREVOD NA UCET"))
      .select(
        when(col("operation") === "PREVOD Z UCTU", col("account"))
          .otherwise(col("account_id")).as("src"),
        when(col("operation") === "PREVOD Z UCTU", col("account_id"))
          .otherwise(col("account")).as("dst"))
      .distinct()
}
