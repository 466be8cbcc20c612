package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook exposing graft's native expressions to SQL
  * (set spark.sql.extensions=graft.expressions.GraftExtensions — done by
  * graft.core.Sessions.tune). SQL users get the full native-expression
  * catalog — `graft_dot`, `graft_cosine`, `graft_simhash64`,
  * `graft_lang_id`, `graft_fingerprint`, `graft_text_profile`,
  * `graft_word_shingles`, `graft_minhash`, `graft_hyperplane_bands`,
  * `graft_cms_buckets`, `graft_bpe_encode`, `graft_importance_logw`,
  * `graft_quality_model` — with the same one-pass implementations the
  * Scala API uses, so a SQL-only user loses nothing (reference scoped a
  * query language out entirely, README.md:27-31; Spark gives us one for
  * free). Fitted artifacts (BPE merge tables, the importance LM, the
  * classifier weight vector) ride as serialized string literals.
  *
  * Shape parameters (shingle n, signature k, seeds, grid sizes) must be
  * SQL literals: they size per-expression constant state (plane matrices,
  * seeded hash mixes) that is built once per operator, not per row.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.{intLit, longLit, strLit}

  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity is validated HERE, not left to cs(i): a SQL call with the
    // wrong argument count must surface as a clean analysis-time error
    // naming the function, never an IndexOutOfBoundsException
    def inject(name: String, clazz: Class[_], arity: Int,
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        cs => {
          if (cs.length != arity) throw new IllegalArgumentException(
            s"$name expects $arity argument(s), got ${cs.length}")
          build(cs)
        }))

    inject("graft_dot", classOf[DotProduct], 2,
      cs => DotProduct(cs(0), cs(1)))

    // cosine(a, b): the one-pass native form (bit-identical to the
    // composed dot/sqrt spelling — see CosineSim scaladoc)
    inject("graft_cosine", classOf[CosineSim], 2,
      cs => CosineSim(cs(0), cs(1)))

    inject("graft_simhash64", classOf[SimHashExpr], 1,
      cs => SimHashExpr(cs(0)))

    inject("graft_lang_id", classOf[LangIdExpr], 1,
      cs => LangIdExpr(cs(0)))

    inject("graft_text_profile", classOf[TextProfileExpr], 1,
      cs => TextProfileExpr(cs(0)))

    inject("graft_fingerprint", classOf[FingerprintExpr], 1,
      cs => FingerprintExpr(cs(0)))

    inject("graft_word_shingles", classOf[WordShingles], 2,
      cs => WordShingles(cs(0), intLit(cs(1), "graft_word_shingles", "n")))

    inject("graft_minhash", classOf[MinHashSignature], 3,
      cs => MinHashSignature(cs(0),
        intLit(cs(1), "graft_minhash", "k"),
        longLit(cs(2), "graft_minhash", "seed")))

    inject("graft_hyperplane_bands", classOf[HyperplaneBands], 5,
      cs => HyperplaneBands(cs(0),
        intLit(cs(1), "graft_hyperplane_bands", "dim"),
        intLit(cs(2), "graft_hyperplane_bands", "n_bands"),
        intLit(cs(3), "graft_hyperplane_bands", "bits_per_band"),
        longLit(cs(4), "graft_hyperplane_bands", "seed")))

    inject("graft_cms_buckets", classOf[CmsBuckets], 3,
      cs => CmsBuckets(cs(0),
        intLit(cs(1), "graft_cms_buckets", "depth"),
        intLit(cs(2), "graft_cms_buckets", "width")))

    // merge table as a literal: "l r,l r,..." in training order — the
    // same per-expression constant-state rule as the plane matrices
    inject("graft_bpe_encode", classOf[BpeEncode], 2,
      cs => BpeEncode(cs(0), BpeEncode.parseMerges(
        strLit(cs(1), "graft_bpe_encode", "merges"))))

    // importance scorer with the fitted LM serialized "bucket:dw,..."
    // plus the unseen-bucket default — the same native node the Scala
    // artifact path (Importance.logw) uses
    inject("graft_importance_logw", classOf[ImportanceLogw], 3, cs => {
      val lmStr = strLit(cs(1), "graft_importance_logw", "lm")
      val default = longLit(cs(2), "graft_importance_logw", "default")
      val dw: Map[Long, Long] =
        if (lmStr.isEmpty) Map.empty
        else lmStr.split(",", -1).toSeq.map { e =>
          val kv = e.split(":", -1)
          require(kv.length == 2,
            s"graft_importance_logw: lm entry '$e' must be 'bucket:dw'")
          kv(0).trim.toLong -> kv(1).trim.toLong
        }.toMap
      ImportanceLogw(cs(0), dw, default)
    })

    // trained quality-classifier scorer with the weight vector as a
    // literal ("w0,w1,w2,w3,w4" in feature order) — the same
    // serialized-artifact pattern as the importance LM; identical
    // expression tree to the Scala QualityModel.score
    inject("graft_quality_model", classOf[TextProfileExpr], 2, cs => {
      val w = graft.operators.QualityModel.Weights.parse(
        strLit(cs(1), "graft_quality_model", "weights"))
      graft.operators.QualityModel.scoreExpr(cs(0), w)
    })

    // hashed-bigram classifier, SQL face: tokens + the serialized
    // NgramWeights artifact ("bias,w0,...,w255") — the same native
    // kernels the Scala QualityModel.ngramScore path runs
    inject("graft_ngram_score", classOf[NgramScore], 2, cs => {
      val w = graft.operators.QualityModel.NgramWeights.parse(
        strLit(cs(1), "graft_ngram_score", "weights"))
      NgramScore(cs(0), w.bias, w.w.toArray)
    })

    inject("graft_ngram_buckets", classOf[NgramBucketIds], 1,
      cs => NgramBucketIds(cs(0)))
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Long, _) => v
    case other => intLit(other, fn, arg).toLong
  }

  private def strLit(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a string literal, got $other")
  }
}
