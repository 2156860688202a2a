package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Native Catalyst expressions (rolling_hash, cosine_sim): parity between
  * the codegen'd path, the interpreted path, the HOF formulation, and the
  * SparkSessionExtensions SQL registration.
  */
class NativeExprSpec extends SparkSpec {

  test("cosine_sim equals the HOF formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val df = Seq.fill(200)((
      Seq.fill(16)(rng.nextDouble() * 2 - 1),
      Seq.fill(16)(rng.nextDouble() * 2 - 1))).toDF("u", "v")
    val hof = aggregate(zip_with(col("u"), col("v"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(col("u"), lit(0.0), (acc, x) => acc + x * x)) *
        sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val bad = df.select(
      graft.ops.Scoring.cosineSimilarity(col("u"), col("v")).as("native"),
      hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("cosine_sim: nulls and length mismatch → null; self-sim = 1") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))),     // self
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))), // length mismatch
      (None, Some(Seq(1.0, 2.0)))                      // null array
    ).toDF("u", "v")
    val r = df.select(
      graft.ops.Scoring.cosineSimilarity(col("u"), col("v")).as("c"))
      .collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(r(1).isNullAt(0) && r(2).isNullAt(0))
  }

  test("interpreted eval matches codegen eval") {
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val u = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      ArrayType(DoubleType))
    val v = Literal.create(ArrayData.toArrayData(Array(3.0, 2.0, 1.0)),
      ArrayType(DoubleType))
    val e = org.apache.spark.sql.graft.ArrayCosineSimilarityExpr(u, v)
    val interp = e.eval(null).asInstanceOf[Double]
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(interp - expected) < 1e-12)
  }

  test("nearest_cell equals the HOF argmin formulation exactly") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val dim = 8
    val centers = Array.fill(7)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
    // random vectors plus exact centroid copies (distance-0 rows) and a
    // duplicated centroid pair to exercise the first-index tie-break
    val tieCenters = centers.updated(3, centers(5).clone())
    val vecs = Seq.fill(300)(Seq.fill(dim)(rng.nextDouble() * 2 - 1)) ++
      tieCenters.map(_.toSeq).toSeq
    val df = vecs.toDF("v")
    val bad = df.select(
        graft.ext.SimSearch.cellExpr(col("v"), tieCenters).as("native"),
        graft.ext.SimSearch.cellExprHof(col("v"), tieCenters).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("nearest_cell dist mode equals array_min of the HOF distances bit-for-bit") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13)
    val dim = 8
    val centers = Array.fill(5)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
    val df = Seq.fill(300)(Seq.fill(dim)(rng.nextDouble() * 2 - 1)).toDF("v")
    def dist2(v: org.apache.spark.sql.Column, c: Array[Double]) =
      aggregate(zip_with(v, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val hof = array_min(array(centers.map(c => dist2(col("v"), c)): _*))
    val bad = df.select(
        org.apache.spark.sql.graft.GraftExprBridge
          .nearestCellDist(col("v"), centers).as("native"),
        hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(bad == 0)
  }

  test("nearest_cell: null element and dim mismatch → null; interpreted = codegen") {
    val s = spark
    import s.implicits._
    val centers = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val df = Seq(
      (1L, Some(Seq(Some(9.0), Some(9.0)))),
      (2L, Some(Seq(Some(1.0), None))),          // null element
      (3L, Some(Seq(Some(1.0), Some(2.0), Some(3.0)))), // dim mismatch
      (4L, Option.empty[Seq[Option[Double]]])    // null vector
    ).toDF("id", "v")
    val r = df.select(col("id"),
        graft.ext.SimSearch.cellExpr(col("v"), centers).as("c"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getInt(1)))).toMap
    assert(r(1L) == Some(1) && r(2L).isEmpty && r(3L).isEmpty &&
      r(4L).isEmpty)
    // interpreted path (direct eval) agrees with the dataframe result
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val v = Literal.create(ArrayData.toArrayData(Array(9.0, 9.0)),
      ArrayType(DoubleType))
    val e = org.apache.spark.sql.graft.NearestCellExpr(v, centers)
    assert(e.eval(null).asInstanceOf[Int] == 1)
  }

  test("extensions register rolling_hash and cosine_sim for SQL") {
    // getOrCreate returns the suite session (ignoring extensions) unless
    // the default is cleared first; the fresh session shares the
    // SparkContext, so do NOT stop it afterwards.
    spark.sparkContext // ensure the shared context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT rolling_hash('ab') AS h,
          |       cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c
          |""".stripMargin).collect()(0)
      assert(r.getLong(0) == ('a'.toLong * 31 + 'b'.toLong))
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  test("md5_halves equals the conv(substring(md5)) composition bit-for-bit") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val strs = Seq("", "a", "ab c", "κόσμε 漢字", "w1 w2 w3") ++
      Seq.fill(500)(rng.alphanumeric.take(rng.nextInt(40) + 1).mkString)
    val df = strs.toDF("s")
    val packed = org.apache.spark.sql.graft.GraftExprBridge
      .md5Halves(col("s"))
    val bad = df.select(
        shiftrightunsigned(packed, 28).as("h1n"),
        (packed bitwiseAND lit((1L << 28) - 1)).as("h2n"),
        conv(substring(md5(col("s")), 1, 7), 16, 10).cast("long").as("h1c"),
        conv(substring(md5(col("s")), 8, 7), 16, 10).cast("long").as("h2c"))
      .filter(col("h1n") =!= col("h1c") || col("h2n") =!= col("h2c"))
      .count()
    assert(bad == 0)
    // interpreted path agrees with codegen (nullSafeEval vs doGenCode)
    val one = Md5HalvesCheck.interpreted("ab c")
    val viaDf = df.filter(col("s") === "ab c").select(packed.as("p"))
      .head().getLong(0)
    assert(one == viaDf)
  }

  test("md5_ppm equals the conv(substring(md5)) % 1e6 composition") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13)
    val strs = Seq("", "7|gsk", "1|2|bg|0", "κόσμε|0|x") ++
      Seq.fill(500)(rng.alphanumeric.take(rng.nextInt(30) + 1).mkString)
    val bad = strs.toDF("s").select(
        org.apache.spark.sql.graft.GraftExprBridge.md5Ppm(col("s"))
          .as("n"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast("bigint")
          % 1000000L).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(bad == 0)
  }
}

/** Driver-side replay of Md5Halves.pack for the interpreted-parity check. */
object Md5HalvesCheck {
  def interpreted(s: String): Long =
    org.apache.spark.sql.graft.Md5Halves.pack(s.getBytes("UTF-8"))
}
