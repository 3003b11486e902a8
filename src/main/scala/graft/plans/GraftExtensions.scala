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
          UnicodeNormalize(
            exprs(0),
            exprs.lift(1).map(_.eval().toString).getOrElse("NFC")
          )
      )
    )
    e.injectFunction(
      (
        new FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (exprs: Seq[Expression]) =>
          MinHashSig(exprs(0), exprs.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(16))
      )
    )
  }
}
