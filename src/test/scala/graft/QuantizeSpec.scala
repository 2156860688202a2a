package graft

import org.apache.spark.sql.functions._
import graft.ext.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(0.0f, 10.0f, 5.0f)),
    (1L, Array(1.0f, 10.0f, 5.0f)),
    (2L, Array(2.0f, 10.0f, 5.0f))
  ).toDF("vec_id", "embedding")

  test("fitRanges: exact per-dimension min/max in dimension order") {
    val (mn, mx) = Quantize.fitRanges(emb)
    assert(mn.toSeq == Seq(0.0, 10.0, 5.0))
    assert(mx.toSeq == Seq(2.0, 10.0, 5.0))
  }

  test("encode: endpoints clamp, interior bins floor, degenerate dims → 0") {
    val (mn, mx) = Quantize.fitRanges(emb)
    val got = Quantize.encode(emb, mn, mx)
      .select(col("vec_id"), col("codes"), col("code_sum"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getLong(2)))).toMap
    // dim0: x=min → floor(0·256)=0; x=max → 256 clamps to 255;
    // x=1 of [0,2] → floor(0.5·256)=128. dims 1,2 degenerate → 0.
    assert(got(0L)._1 == Seq(0, 0, 0))
    assert(got(1L)._1 == Seq(128, 0, 0))
    assert(got(2L)._1 == Seq(255, 0, 0))
    // code_sum is the integer sum of the codes
    assert(got(1L)._2 == 128L && got(2L)._2 == 255L)
  }

  test("reconstruction error is bounded by one bin width") {
    val n = 97
    val df = (0 until n).map(i =>
      (i.toLong, Array((i * 0.37f) % 7.0f - 3.0f))).toDF("vec_id", "embedding")
    val (mn, mx) = Quantize.fitRanges(df)
    val bin = (mx(0) - mn(0)) / 256.0
    val rows = Quantize.encode(df, mn, mx)
      .select(col("vec_id"), element_at(col("embedding"), 1).cast("double"),
        element_at(col("codes"), 1))
      .collect()
    rows.foreach { r =>
      val x = r.getDouble(1); val c = r.getInt(2)
      val recon = mn(0) + (c + 0.5) * bin
      assert(math.abs(recon - x) <= bin * 0.5 + 1e-12,
        s"vec ${r.getLong(0)}: x=$x code=$c recon=$recon bin=$bin")
    }
  }

  test("encode is a map-only projection (no exchange in the plan)") {
    val (mn, mx) = Quantize.fitRanges(emb)
    val plan = Quantize.encode(emb, mn, mx)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("fitRanges plan partial-aggregates before the dim-key exchange") {
    // the scan-side HashAggregate must appear below the exchange: each
    // task reduces its explosion to ≤dim rows before shuffling
    val plan = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")), max(col("x").cast("double")))
      .queryExecution.executedPlan.toString
    val exch = plan.indexOf("Exchange")
    val firstAgg = plan.lastIndexOf("HashAggregate")
    assert(exch >= 0 && firstAgg > exch,
      s"expected partial aggregate below the exchange:\n$plan")
  }
}
