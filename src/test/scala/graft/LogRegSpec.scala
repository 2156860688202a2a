package graft

import org.apache.spark.sql.functions._
import graft.ml.LogReg

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  test("solve: exact solution of a small SPD system") {
    // A = [[4,1],[1,3]], b = [1,2] → x = [1/11, 7/11]
    val x = LogReg.solve(Array(Array(4.0, 1.0), Array(1.0, 3.0)),
      Array(1.0, 2.0))
    assert(math.abs(x(0) - 1.0 / 11) < 1e-12)
    assert(math.abs(x(1) - 7.0 / 11) < 1e-12)
  }

  test("solve: partial pivoting handles a zero leading pivot") {
    // [[0,1],[1,0]] x = [2,3] → x = [3,2]; no pivoting would divide by 0
    val x = LogReg.solve(Array(Array(0.0, 1.0), Array(1.0, 0.0)),
      Array(2.0, 3.0))
    assert(math.abs(x(0) - 3.0) < 1e-12 && math.abs(x(1) - 2.0) < 1e-12)
  }

  // deterministic synthetic: labels drawn from a KNOWN logistic model
  // P(y=1) = sigmoid(-1 + 2·x1 − 3·x2) with seeded noise, so the IRLS fit
  // must land near (-1, 2, -3) and classify the Bayes-optimal way
  private def synth(n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { _ =>
      val x1 = rnd.nextDouble() * 2 - 1
      val x2 = rnd.nextDouble() * 2 - 1
      val p = 1.0 / (1.0 + math.exp(-(-1.0 + 2.0 * x1 - 3.0 * x2)))
      (if (rnd.nextDouble() < p) 1.0 else 0.0, x1, x2)
    }.toDF("y", "x1", "x2")
  }

  test("fitIrls recovers the generating model's weights") {
    val w = LogReg.fitIrls(synth(4000), Seq("x1", "x2"), "y")
    assert(math.abs(w(0) - (-1.0)) < 0.3, s"intercept ${w(0)}")
    assert(math.abs(w(1) - 2.0) < 0.4, s"w1 ${w(1)}")
    assert(math.abs(w(2) - (-3.0)) < 0.5, s"w2 ${w(2)}")
  }

  test("fitIrls is stable on the same input (fit twice, same weights)") {
    val df = synth(1000)
    val w1 = LogReg.fitIrls(df, Seq("x1", "x2"), "y")
    val w2 = LogReg.fitIrls(df, Seq("x1", "x2"), "y")
    w1.zip(w2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8) }
  }

  test("fitIrls on separable labels stays finite (ridge + wt floor)") {
    val df = (0 until 200).map { i =>
      val x = i / 100.0 - 1.0           // [-1, 1)
      (if (x > 0) 1.0 else 0.0, x)
    }.toDF("y", "x")
    val w = LogReg.fitIrls(df, Seq("x"), "y")
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
    assert(w(1) > 0)                    // slope points the right way
    // and the fitted model separates the training data perfectly
    val acc = df.select(
        (((lit(w(0)) + col("x") * w(1)) > 0).cast("double") === col("y"))
          .cast("long").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    assert(acc == 1.0)
  }

  test("boolean labels work and the q85 distillation label is learnable") {
    // the q85 teacher (q18 composite rule ≥ 0.55) is near-linear in the
    // student's features over this corpus, so the distilled classifier
    // must reproduce the teacher verdict almost everywhere
    val feats = graft.ext.TextOps.qualityFeatures(
        graft.model.Tables.table(spark, "/root/testdata/sf0.001",
          "documents"))
      .select(
        round(col("stopword_ratio"), 6).as("f_stop"),
        round(col("digit_ratio"), 6).as("f_digit"),
        round(col("distinct_token_ratio"), 6).as("f_distinct"),
        round(col("mean_token_len"), 6).as("f_mtl"))
      .select((lit(0.4) * least(col("f_stop") * 4.0, lit(1.0)) +
          lit(0.3) * col("f_distinct") +
          lit(0.3) * (lit(1.0) - least(col("f_digit") * 5.0, lit(1.0)))
          >= 0.55).as("is_hq"),
        col("f_stop"), col("f_distinct"), col("f_mtl"))
    val cols = Seq("f_stop", "f_distinct", "f_mtl")
    val w = LogReg.fitIrls(feats, cols, "is_hq")
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
    val logit = cols.zipWithIndex
      .map { case (f, i) => col(f) * w(i + 1) }
      .foldLeft(lit(1.0) * w(0))(_ + _)
    val acc = feats.select(((logit > 0) === col("is_hq"))
        .cast("long").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("scoring is a map-only projection (no exchange in the plan)") {
    val df = synth(100)
    val w = Array(0.1, 0.2, 0.3)
    // the PRODUCTION scoring path (q85 / curate --c), not a hand-built
    // twin: if LogReg.logit ever grew plan-shaping structure, this must
    // fail
    val scored = df.select(
      LogReg.logit(w, Seq("x1", "x2")).as("logit"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
