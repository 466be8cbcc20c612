package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions
import graft.operators.QualityModel
import graft.operators.QualityModel.Weights

/** Pins the trainable quality classifier on top of its oracled anchors
  * (q_logreg_step, q_quality_classifier): gradient-descent behavior,
  * separation on the weak label, and exact partition invariance of the
  * learned weights (the DECIMAL gradient-sum contract).
  */
class QualityModelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  private val label = col("source") === "src0"

  test("training descends the logistic loss and beats the zero model") {
    val l0 = QualityModel.loss(docs, col("text"), label, Weights.zero)
    val w5 = QualityModel.fit(docs, col("text"), label, iters = 5)
    val l5 = QualityModel.loss(docs, col("text"), label, w5)
    val w20 = QualityModel.fit(docs, col("text"), label, iters = 20,
      init = w5)
    val l20 = QualityModel.loss(docs, col("text"), label, w20)
    assert(l5 < l0, s"5 GD steps must reduce loss: $l5 >= $l0")
    assert(l20 <= l5, s"more steps must not regress: $l20 > $l5")
  }

  test("the learned model separates a LEARNABLE label (distilling the " +
      "quality heuristic into a smooth score)") {
    // the source label is unlearnable by construction (fixture sources
    // share one generator — the descent test above shows the loss still
    // moves, to the base rate); a label the features carry is the
    // heuristic gate itself, the distillation use the operator exists
    // for
    val ql = graft.functions.TextFunctions.qualityScore(col("text")) >= 0.6
    val w = QualityModel.fit(docs, col("text"), ql, iters = 25)
    val means = docs
      .groupBy(ql.as("y"))
      .agg(avg(QualityModel.score(col("text"), w)).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false) + 0.05,
      s"positive-class mean score ${means(true)} must clearly exceed " +
        s"negative ${means(false)}")
  }

  test("learned weights are EXACTLY partition-invariant (decimal " +
      "gradient sums)") {
    val a = QualityModel.fit(docs, col("text"), label, iters = 8)
    val b = QualityModel.fit(docs.repartition(13), col("text"), label,
      iters = 8)
    assert(a == b, s"weights diverged across partitionings: $a vs $b")
  }

  test("gradient and loss fail loudly on an empty corpus, and loss " +
      "stays finite under extreme weights (log clipping)") {
    val empty = docs.where(lit(false))
    val eg = intercept[IllegalArgumentException](
      QualityModel.gradient(empty, col("text"), label, Weights.zero))
    assert(eg.getMessage.contains("empty corpus"))
    val el = intercept[IllegalArgumentException](
      QualityModel.loss(empty, col("text"), label, Weights.zero))
    assert(el.getMessage.contains("empty corpus"))
    // weights large enough to saturate the sigmoid to exactly 0/1:
    // unclamped log(0) would NULL those rows out of the mean
    val extreme = Weights(Seq(-5000.0, 0.0, 0.0, 0.0, 0.0))
    // expected ~= positiveShare * -ln(eps) ~= 0.05 * 34.5 ~= 1.7;
    // without the clamp the saturated rows NULL out and the mean ~= 0
    val l = QualityModel.loss(docs, col("text"), label, extreme)
    assert(!l.isNaN && !l.isInfinite && l > 1.0,
      s"clipped loss must be finite and penalizing under saturation, got $l")
  }

  test("gradient at zero weights equals the driver-side computation") {
    val rows = docs.select(col("text"),
        QualityModel.features(col("text")).as("f"), label.as("y"))
      .collect()
    val n = rows.length
    val want = (0 until QualityModel.Dim).map { j =>
      rows.map { r =>
        val f = r.getSeq[Double](1)
        val y = if (r.getBoolean(2)) 1.0 else 0.0
        BigDecimal((0.5 - y) * f(j)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / n
    }
    val got = QualityModel.gradient(docs, col("text"), label, Weights.zero)
    got.zip(want).zipWithIndex.foreach { case ((g, w), j) =>
      assert(math.abs(g - w) < 1e-9, s"grad[$j]: $g vs $w")
    }
  }
}
