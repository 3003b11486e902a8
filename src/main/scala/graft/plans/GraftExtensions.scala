package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) get the engine's
  * native functions in SQL without any imperative registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        new FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("md5_prefix60"),
        new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
        (exprs: Seq[Expression]) => Md5Prefix60(exprs(0))
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("unicode_normalize"),
        new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
        (exprs: Seq[Expression]) =>
          UnicodeNormalize(exprs(0), GraftExtensions.literalArg("unicode_normalize", exprs.lift(1), "NFC").toString)
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (exprs: Seq[Expression]) =>
          MinHashSig(
            exprs(0),
            GraftExtensions.literalArg("minhash_sig", exprs.lift(1), 16).asInstanceOf[Number].intValue()
          )
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("bpe_tokens"),
        new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_tokens"),
        (exprs: Seq[Expression]) => BpeTokenCount(exprs(0))
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("simhash60"),
        new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
        (exprs: Seq[Expression]) => SimHash60(exprs(0))
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("shingle_hash60"),
        new ExpressionInfo(classOf[ShingleHash60].getName, "shingle_hash60"),
        (exprs: Seq[Expression]) =>
          ShingleHash60(
            exprs(0),
            GraftExtensions.literalArg("shingle_hash60", exprs.lift(1), 3).asInstanceOf[Number].intValue()
          )
      )
    )
  }
}

object GraftExtensions {
  /** Config-style arguments must be non-null literals — a column reference
    * would otherwise blow up inside the analyzer with an opaque eval error.
    */
  private[plans] def literalArg(fn: String, e: Option[Expression], default: Any): Any =
    e match {
      case None => default
      case Some(expr) =>
        if (!expr.foldable)
          throw new IllegalArgumentException(s"$fn: second argument must be a literal, got $expr")
        val v = expr.eval()
        if (v == null) throw new IllegalArgumentException(s"$fn: second argument must not be NULL")
        v
    }
}
