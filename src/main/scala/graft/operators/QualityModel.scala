package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Add, CaseWhen, Cast, Divide, Exp, Expression, GetStructField, GreaterThan, Least, Literal, Multiply, UnaryMinus}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Trainable logistic-regression quality classifier — the
  * fastText-style model-based corpus filter (CCNet-class pipelines
  * train a small classifier on weak labels and keep documents it
  * scores as reference-like), built Spark-shaped:
  *
  *  - FEATURES are a fixed 5-dim vector from ONE TextProfileExpr scan
  *    per document (bias, bounded length score, stopword ratio,
  *    punctuation ratio, bounded char-length score) — every component
  *    a ratio in [0, 1] built from exact integer counts with one IEEE
  *    division each, so the identical values fall out of DuckDB SQL
  *    and the oracle compares bit-for-bit.
  *  - TRAINING state is the weight vector (dim+0 doubles) on the
  *    driver; each gradient-descent step is ONE combiner-friendly
  *    aggregation over the corpus that ships 5 numbers back. Cost per
  *    step = one corpus scan, independent of cluster size — the same
  *    bounded-driver-state contract as Ann.kmeansTrain (k×dim) and
  *    Bpe's argmax. Gradient sums go through DECIMAL(28,10) so the
  *    result is order-independent: the learned weights are identical
  *    under any partitioning (QualityModelSpec pins this).
  *  - SCORING is a map-only codegen'd projection (sigmoid of a 5-term
  *    dot product) — at 100 TB it rides the same scan as the other
  *    per-document text ops, no join, no shuffle, no broadcast wait.
  *
  * The oracled anchors (q_logreg_step, q_quality_classifier) follow
  * the BPE/k-means pattern: one exactly-reproducible step (zero-weight
  * gradient needs no exp at all: sigmoid(0) is exactly 0.5) plus the
  * full scorer under a fixed weight vector; the iterative trainer is
  * pinned by QualityModelSpec (loss decrease, separation, partition
  * invariance) on top of those anchors.
  */
object QualityModel {

  /** Feature dimension including the leading bias term. */
  val Dim = 5

  final case class Weights(w: Seq[Double]) {
    require(w.size == Dim, s"expected $Dim weights, got ${w.size}")
  }

  object Weights {
    val zero: Weights = Weights(Seq.fill(Dim)(0.0))

    /** SQL-surface serialization: comma-separated doubles in feature
      * order ("-1.0,1.2,0.8,-2.0,0.5"). Double.toString/parseDouble
      * round-trip exactly, so serialize∘parse is the identity.
      */
    def parse(s: String): Weights = {
      val parts = s.split(",", -1).toSeq.map(_.trim)
      require(parts.size == Dim,
        s"quality-model weights must carry $Dim comma-separated values, " +
          s"got ${parts.size} in '$s'")
      Weights(parts.map(java.lang.Double.parseDouble))
    }

    def serialize(w: Weights): String = w.w.mkString(",")
  }

  /** The 5 feature trees as raw Catalyst nodes — the single source of
    * truth for both the Scala API below and the SQL surface
    * (graft_quality_model builds on these directly: an injected
    * function must return a resolvable Expression, and Column-API trees
    * wrap unresolved nodes the analyzer won't descend into). All
    * arithmetic is explicitly typed (every division double/double) so
    * no coercion rule is relied on. Catalyst CSEs the repeated profile
    * subtree — equal case-class nodes are one evaluation per row.
    */
  private[graft] def featureExprs(text: Expression): Seq[Expression] = {
    val p = graft.expressions.TextProfileExpr(text)
    val nTok = GetStructField(p, 0, Some("n_tokens"))
    val nStop = GetStructField(p, 1, Some("n_stop"))
    val nPunct = GetStructField(p, 2, Some("n_punct"))
    val nChars = GetStructField(p, 3, Some("n_chars"))
    def d(e: Expression): Expression = Cast(e, DoubleType)
    Seq(
      Literal(1.0),
      Least(Seq(Divide(d(nTok), Literal(50.0)), Literal(1.0))),
      CaseWhen(Seq((GreaterThan(nTok, Literal(0L)),
        Divide(d(nStop), d(nTok)))), Some(Literal(0.0))),
      CaseWhen(Seq((GreaterThan(nChars, Literal(0L)),
        Divide(d(nPunct), d(nChars)))), Some(Literal(0.0))),
      Least(Seq(Divide(d(nChars), Literal(400.0)), Literal(1.0))))
  }

  /** sigmoid(w · features(text)) as a raw expression tree (the SQL
    * builder's entry point).
    */
  private[graft] def scoreExpr(text: Expression, weights: Weights): Expression = {
    val z = featureExprs(text).zip(weights.w)
      .map { case (f, wi) => Multiply(f, Literal(wi)): Expression }
      .reduce(Add(_, _))
    Divide(Literal(1.0), Add(Literal(1.0), Exp(UnaryMinus(z))))
  }

  private def featureCols(text: Column): Seq[Column] =
    featureExprs(ColumnBridge.expression(text)).map(ColumnBridge.column)

  /** The feature vector as an array column (for inspection/export). */
  def features(text: Column): Column = array(featureCols(text): _*)

  /** Map-only score: sigmoid(w · features(text)). */
  def score(text: Column, weights: Weights): Column =
    ColumnBridge.column(scoreExpr(ColumnBridge.expression(text), weights))

  /** Rows that can contribute to training: a null text or label must
    * drop from BOTH the numerator and the denominator of the gradient /
    * loss means — keeping them in the count silently shrinks every mean
    * toward zero on corpora with partial nulls.
    */
  private def trainable(docs: DataFrame, text: Column, label: Column): DataFrame =
    docs.where(text.isNotNull && label.isNotNull)

  /** One logistic-loss gradient over the corpus:
    * grad_j = mean((sigmoid(w·x) - y) * x_j) over rows with non-null
    * text AND label, with the per-dimension sums in exact DECIMAL so
    * the result is independent of partitioning and order. One
    * aggregation job, Dim values out.
    */
  def gradient(docs: DataFrame, text: Column, label: Column,
      weights: Weights): Seq[Double] = {
    val err = (score(text, weights) - label.cast("double")).as("err")
    val feats = featureCols(text).zipWithIndex
      .map { case (f, j) => f.as(s"f$j") }
    val proj = trainable(docs, text, label).select(err +: feats: _*)
    val aggs = (0 until Dim).map { j =>
      (sum((col("err") * col(s"f$j")).cast("decimal(28,10)"))
        .cast("double") / count(lit(1))).as(s"g$j")
    }
    val row = proj.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0),
      "gradient undefined: empty corpus (or all-null text/label rows)")
    (0 until Dim).map(row.getDouble)
  }

  /** Batch gradient descent from `init`: `iters` corpus scans, weight
    * state on the driver only.
    */
  def fit(docs: DataFrame, text: Column, label: Column, iters: Int,
      lr: Double = 1.0, init: Weights = Weights.zero): Weights = {
    require(iters >= 0, "iters must be >= 0")
    var w = init
    for (_ <- 0 until iters) {
      val g = gradient(docs, text, label, w)
      w = Weights(w.w.zip(g).map { case (wi, gi) => wi - lr * gi })
    }
    w
  }

  /** Mean logistic loss −mean(y ln p + (1−y) ln(1−p)) — the trainer's
    * objective, for specs that pin descent. The probability is clamped
    * to [1e-15, 1−1e-15] before the logs (standard log-loss clipping):
    * extreme weights overflow exp so p degenerates to exactly 0/1, and
    * Spark's log(0) is NULL — unclamped, those rows would silently
    * vanish from the sum while still being counted, understating the
    * loss instead of penalizing it.
    */
  def loss(docs: DataFrame, text: Column, label: Column,
      weights: Weights): Double =
    lossOf(trainable(docs, text, label), score(text, weights), label)

  private def lossOf(clean: DataFrame, p0: Column, label: Column): Double = {
    val eps = 1e-15
    val p = greatest(least(p0, lit(1.0 - eps)), lit(eps))
    val y = label.cast("double")
    val row = clean
      .select((-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))).as("l"))
      .agg((sum(col("l").cast("decimal(28,10)")).cast("double") /
        count(lit(1))).as("m"))
      .head()
    require(!row.isNullAt(0),
      "loss undefined: empty corpus (or all-null text/label rows)")
    row.getDouble(0)
  }

  // --- hashed n-gram model ---------------------------------------------
  //
  // The profile features above are 5 hand-picked ratios; the model real
  // CCNet/fastText-class pipelines train is a linear classifier over
  // HASHED N-GRAM counts — the text's content, not just its shape. Same
  // Spark contract as the 5-dim model, sparse edition:
  //
  //  - FEATURES: token bigrams hashed into NgramBuckets buckets (md5
  //    first-two-hex-digits — the q_importance_weights bucket idiom, so
  //    the zero-weight gradient step oracles exactly in DuckDB) plus a
  //    bias slot (bucket -1). A document's feature vector is the sparse
  //    integer COUNT per bucket, produced by one explode — no dense
  //    vectors materialize anywhere.
  //  - TRAINING: one explode+groupBy(bucket) job per step; the gradient
  //    ships <= NgramBuckets+1 (s, c) rows to the driver, the bias
  //    bucket's count doubling as the row count N (one corpus pass,
  //    nothing else). DECIMAL(28,10) sums keep the learned weights
  //    exactly partition-invariant.
  //  - SCORING: map-only — the <= 256-double weight vector rides as
  //    per-expression constant state in a native one-pass kernel
  //    (expressions.NgramScore; the earlier literal-array-in-lambda
  //    form re-materialized the array per bigram per row, interpreted —
  //    the round-12 radar's 29.7 s catch) and the per-document fold is
  //    left-to-right over the bigram buckets (deterministic
  //    accumulation order). At a 2^20-bucket production configuration
  //    the constant-state trick still works (8 MB of expression state)
  //    but a broadcast join against the exploded bigrams is the better
  //    shape; 256 buckets is the oracle-exact anchor configuration.

  /** Hashed-bigram bucket count (md5 first two hex digits: 16^2). */
  val NgramBuckets = 256

  /** Weights of the hashed-bigram model: a bias plus one weight per
    * bucket.
    */
  final case class NgramWeights(bias: Double, w: IndexedSeq[Double]) {
    require(w.size == NgramBuckets,
      s"expected $NgramBuckets bucket weights, got ${w.size}")
  }

  object NgramWeights {
    val zero: NgramWeights =
      NgramWeights(0.0, IndexedSeq.fill(NgramBuckets)(0.0))

    /** Serialized-artifact form, the SQL-surface / Artifacts currency:
      * "bias,w0,w1,...,w255" — same shortest-round-trip double text as
      * Weights.serialize (Double.toString/parseDouble are exact
      * inverses, so the round trip is bit-lossless).
      */
    def parse(s: String): NgramWeights = {
      val parts = s.split(",", -1).toSeq.map(_.trim)
      require(parts.size == NgramBuckets + 1,
        s"ngram weights must carry ${NgramBuckets + 1} comma-separated " +
          s"values (bias first), got ${parts.size}")
      NgramWeights(java.lang.Double.parseDouble(parts.head),
        parts.tail.map(java.lang.Double.parseDouble).toIndexedSeq)
    }

    def serialize(w: NgramWeights): String =
      (w.bias +: w.w).mkString(",")
  }

  /** array<long> of md5-derived buckets, one per adjacent token pair
    * ("tok1 tok2"). Tokens are whitespace-split, so the single-space
    * joiner cannot collide two distinct bigrams. A document with < 2
    * tokens (including empty/whitespace-only text) has no bigrams and
    * yields an empty array — the slice length is clamped at 0 because
    * Spark rejects negative slice lengths outright.
    */
  def bigramBuckets(text: Column): Column =
    graft.expressions.NgramBucketIds(graft.functions.TextFunctions.tokens(text))

  /** Map-only score: sigmoid(bias + sum over bigrams of w(bucket)),
    * as ONE native expression pass (graft.expressions.NgramScore). The
    * previous Column form embedded the 256-double weight literal inside
    * an `aggregate` lambda — no codegen/CSE in lambdas, so the literal
    * re-materialized per bigram per row, interpreted (29.7 s for one
    * sf0.1 gradient step; the round-12 radar catch). Numerics are
    * bit-identical (same fold order, same md5-byte bucket, same
    * sigmoid op order) — the oracle and spec pins did not move.
    */
  def ngramScore(text: Column, weights: NgramWeights): Column =
    graft.expressions.NgramScore(
      graft.functions.TextFunctions.tokens(text),
      weights.bias, weights.w.toArray)

  /** One sparse logistic-loss gradient: mean((sigmoid(z) - y) * x_b)
    * per bucket, x_b = the document's bigram count in bucket b, plus
    * the bias mean at bucket -1. One explode+groupBy job; the bias
    * group's count is the denominator N, so no second pass runs. The
    * returned NgramWeights holds the GRADIENT (bias slot included).
    */
  def ngramGradient(docs: DataFrame, text: Column, label: Column,
      weights: NgramWeights): NgramWeights = {
    // Materialize the bucket array ONCE (withColumn barrier): both the
    // error term and the exploded sparse features consume it, and
    // fusing them over a shared column means one tokenize+md5 pass per
    // document instead of two (NgramScoreFromBuckets is the
    // weight-lookup-only face of the scorer).
    val err = (graft.expressions.NgramScoreFromBuckets(
        col("__bb"), weights.bias, weights.w.toArray)
      - label.cast("double")).as("err")
    val rows = trainable(docs, text, label)
      .withColumn("__bb", bigramBuckets(text))
      .select(err,
        explode(concat(array(lit(-1L)), col("__bb"))).as("b"))
      .groupBy("b")
      .agg(sum(col("err").cast("decimal(28,10)")).cast("double").as("s"),
        count(lit(1)).as("c"))
      .collect()
    val bias = rows.find(_.getLong(0) == -1L)
    require(bias.nonEmpty,
      "gradient undefined: empty corpus (or all-null text/label rows)")
    val n = bias.get.getLong(2).toDouble
    val g = Array.fill(NgramBuckets)(0.0)
    rows.foreach { r =>
      val b = r.getLong(0)
      if (b >= 0) g(b.toInt) = r.getDouble(1) / n
    }
    NgramWeights(bias.get.getDouble(1) / n, g.toIndexedSeq)
  }

  /** Batch gradient descent for the hashed model: `iters` corpus scans,
    * <= NgramBuckets+1 doubles of driver state.
    */
  def fitNgram(docs: DataFrame, text: Column, label: Column, iters: Int,
      lr: Double = 1.0, init: NgramWeights = NgramWeights.zero): NgramWeights = {
    require(iters >= 0, "iters must be >= 0")
    var w = init
    for (_ <- 0 until iters) {
      val g = ngramGradient(docs, text, label, w)
      w = NgramWeights(w.bias - lr * g.bias,
        w.w.zip(g.w).map { case (wi, gi) => wi - lr * gi })
    }
    w
  }

  /** Mean logistic loss of the hashed model (same clipping as `loss`). */
  def ngramLoss(docs: DataFrame, text: Column, label: Column,
      weights: NgramWeights): Double =
    lossOf(trainable(docs, text, label), ngramScore(text, weights), label)
}
