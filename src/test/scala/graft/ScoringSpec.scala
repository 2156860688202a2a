package graft

import org.apache.spark.sql.functions._
import graft.ops.Scoring

/** M2 cosine, M4 closed-form power-law fit, A13 log bins. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("cosine distance: orthogonal = 1, parallel = 0, opposite = 2") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 1.0), Seq(2.0, 2.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0))
    ).toDF("u", "v")
    val got = df.select(Scoring.cosineDistance($"u", $"v"))
      .as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1) - 0.0) < 1e-12)
    assert(math.abs(got(2) - 2.0) < 1e-12)
  }

  test("powerlaw fit recovers exact slope/intercept on y=e^b·x^a") {
    // exact log-linear data (+1-shift inverted so the logs are exact):
    // ln(y+1) = 2·ln(x+1) + 1  →  y = e·(x+1)² − 1
    val a = 2.0
    val b = 1.0
    val pts = (1 to 50).map { i =>
      val x = i.toDouble
      val y = math.exp(b) * math.pow(x + 1, a) - 1.0
      (x, y)
    }
    val df = pts.toDF("x", "y")
    val r = Scoring.powerlawFit(df, "x", "y").collect().head
    assert(math.abs(r.getAs[Double]("slope") - a) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - b) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(r.getAs[Long]("n") == 50)
  }

  test("log-binned means: digitize(right=True) on power-of-2 bins") {
    // np.digitize(x, [1,2,4,8], right=True): 2 → bin 1 (≤2), 3 → bin 2,
    // 4 → bin 2 (≤4), 5 → bin 3 ≡ ceil(log2 x)
    val df = Seq((2.0, 10.0), (3.0, 20.0), (4.0, 30.0), (5.0, 40.0))
      .toDF("x", "y")
    val got = Scoring.logBinnedMeans(df, "x", "y")
      .select($"bin", $"mean_y").as[(Long, Double)].collect().toMap
    assert(got(1L) == 10.0)
    assert(got(2L) == 25.0) // mean(20, 30)
    assert(got(3L) == 40.0)
  }

  test("argmax picks max value, smallest id on ties") {
    val df = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0)).toDF("id", "v")
    val r = Scoring.argmax(df, "id", "v").collect().head
    assert(r.getLong(0) == 2L)
  }
}
