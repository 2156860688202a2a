package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + the canonical temporal-edge-list derivation.
  *
  * Data model (SURVEY §1): the engine's fundamental abstraction is a
  * weighted temporal directed multigraph stored as a row table
  * `edges(src BIGINT, dst BIGINT, weight BIGINT, ts BIGINT)` — the Spark
  * re-expression of the reference's pandas edge list
  * (`/root/reference/AA-AR.py:286-287`). Adjacency matrices are *encodings*;
  * the model is always the edge DataFrame (sparse COO), which is the only
  * representation that scales: a dense n×n matrix is quadratic, an edge
  * list is linear in |E| and partitions horizontally.
  */
object Tables {

  /** Read one driver testdata table (TESTDATA.md): parquet under `dir`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` has shipped in two parquet physical types
    * across driver generations: TIMESTAMP(NANOS) — which Spark's
    * vectorized reader refuses outright (PARQUET_TYPE_ILLEGAL) unless
    * read as raw Long via `spark.sql.legacy.parquet.nanosAsLong` — and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers as
    * TIMESTAMP_NTZ. Both branches normalize to one generation-independent
    * schema, `ts TIMESTAMP` (LTZ): nanos-as-Long converts exactly (the
    * data is second-granular), and the NTZ→LTZ cast is exact under the
    * engine's pinned UTC session timezone. One schema means every
    * downstream consumer — window(), session_window, intervalJoin's
    * epoch math — sees a single dtype regardless of which driver
    * generation wrote the file.
    *
    * NOTE the legacy conf is SESSION-WIDE and deliberately left set: it
    * is a no-op for non-nanos parquet, and restoring it immediately would
    * be unsafe anyway — the read is lazy, so the scan may consult the
    * conf after this method returns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Canonical temporal edge list derived from the driver's star schema
    * (FIXTURES.md §2): src = customer, dst = supplier, weight =
    * extendedprice truncated to BIGINT (the reference forces integer
    * weights, `AA-AR.py:286` `dtype=int`), ts = integer day number
    * (the reference's timestamps are abstract integer periods,
    * `AA-AR.py:102-104`).
    *
    * Scale notes: single equi-join on o_orderkey; at 100 TB both sides are
    * co-partitionable on the key (bucketed tables would make this
    * shuffle-free), and Catalyst pushes the 4-column projection into both
    * parquet scans so we never read the wide rows.
    */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(
        col("o_custkey").as("src"),
        col("l_suppkey").as("dst"),
        col("l_extendedprice").cast("bigint").as("weight"),
        // day number via DATE arithmetic: timezone-proof (identical whether
        // the parquet timestamp is read as LTZ or NTZ) and exact.
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("bigint").as("ts"))
  }

  /** The same edge list as a DuckDB CTE, for oracle SQL strings. */
  val edgesSqlCte: String =
    // floor() before the BIGINT cast: DuckDB's double→BIGINT cast ROUNDS
    // while Spark's (and numpy's dtype=int) truncates; prices are positive
    // so floor ≡ trunc.
    """edges AS (
      |  SELECT o.o_custkey AS src, l.l_suppkey AS dst,
      |         CAST(floor(l.l_extendedprice) AS BIGINT) AS weight,
      |         CAST(date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS BIGINT) AS ts
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |)""".stripMargin
}
