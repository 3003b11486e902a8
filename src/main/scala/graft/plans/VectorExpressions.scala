package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native dot product over numeric arrays, with whole-stage codegen.
  *
  * The `functions.aggregate`/`zip_with` formulation is evaluated by
  * interpreted lambda machinery (one closure dispatch per element); this
  * expression compiles to a tight primitive loop, which matters when scoring
  * millions of embeddings per task. Accumulation is strictly index-ascending
  * — the same left-to-right fold as the HOF formulation and the DuckDB
  * ordered-aggregate oracle, so results stay bit-identical.
  *
  * Null handling: a null array yields null; null ELEMENTS are treated as 0
  * (embedding tables don't have them; documented divergence from zip_with's
  * null-poisoning).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _                                                             => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DotProduct requires numeric array inputs, got ${left.dataType} / ${right.dataType}"
      )
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getElem(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case _           => 0.0
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(la.numElements(), ra.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !ra.isNullAt(i)) acc += getElem(la, i, lt) * getElem(ra, i, rt)
      i += 1
    }
    acc
  }

  private def genGet(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType   => s"(double)$arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double)$arr.getInt($i)"
    case LongType    => s"(double)$arr.getLong($i)"
    case _           => "0.0"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
         |    $acc += ${genGet(l, i, elemType(left))} * ${genGet(r, i, elemType(right))};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column API for the codegen'd dot product. */
  def dotNative(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Register `dot_product` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf"
    )
}
