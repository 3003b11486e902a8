package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** All LSH bucket ids for a vector in ONE pass: `tables` independent
  * sign-random-projection families of `nBits` hyperplanes each. The
  * per-bucket formulation evaluates tables*nBits separate DotProducts —
  * each traversing the vector — so an 8-table/5-bit probe reads every
  * element 40 times; this expression reads it once, accumulating all 40
  * dots in a flat register array (per-plane accumulation stays strictly
  * index-ascending, so each dot is bit-identical to the single-plane
  * [[DotProduct]] fold and to the oracle's ordered sums).
  *
  * Hyperplane signs come from the same deterministic closed form as
  * [[graft.operators.Similarity.hyperplaneSign]] (plane id = table*1024 +
  * bit), precomputed once driver-side and shipped as a reference object.
  */
case class LshBuckets(child: Expression, dim: Int, nBits: Int, tables: Int, tableOffset: Int = 0) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"LshBuckets requires array<float|double>, got $dt"
        )
    }

  /** signs(plane * dim + i), plane = t * nBits + b — row-major, one flat
    * array so the generated loop is a pure linear scan.
    */
  @transient lazy val signs: Array[Double] = LshBuckets.signTable(dim, nBits, tables, tableOffset)

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(LshBuckets.buckets(arr, signs, dim, nBits, tables, isFloat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    val fl = if (isFloat) "true" else "false"
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  graft.plans.LshBuckets$$.MODULE$$.buckets($c, $signsRef, $dim, $nBits, $tables, $fl));
       """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object LshBuckets {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def signTable(dim: Int, nBits: Int, tables: Int, tableOffset: Int = 0): Array[Double] = {
    val out = new Array[Double](tables * nBits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < nBits) {
        var i = 0
        while (i < dim) {
          out((t * nBits + b) * dim + i) = graft.operators.Similarity.hyperplaneSign((tableOffset + t) * 1024 + b, i)
          i += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }

  /** One pass over the vector; per-plane accumulation in ascending index
    * order (bit-compatible with the single-plane fold).
    */
  def buckets(arr: ArrayData, signs: Array[Double], dim: Int, nBits: Int, tables: Int, isFloat: Boolean): Array[Long] = {
    val planes = tables * nBits
    val acc = new Array[Double](planes)
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        var p = 0
        while (p < planes) { acc(p) += x * signs(p * dim + i); p += 1 }
      }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        if (acc(t * nBits + b) > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}

/** Pack an int array of SQ8 codes into a BINARY column — ONE byte per
  * dimension, the at-rest format that makes 8-bit scalar quantization a
  * 4x storage/bandwidth win over float32 (array<int> in parquet would
  * spend 4 bytes per code and forfeit the point). Values are clamped to
  * [-128, 127]; null elements pack as 0.
  */
case class PackInt8(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"PackInt8 requires array<int|long>, got $dt"
        )
    }

  private def isLong = child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(v: Any): Any =
    PackInt8.pack(v.asInstanceOf[ArrayData], isLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PackInt8$$.MODULE$$.pack($c, ${if (isLong) "true" else "false"});")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object PackInt8 {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def pack(arr: ArrayData, isLong: Boolean): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = if (isLong) arr.getLong(i) else arr.getInt(i).toLong
        out(i) = math.max(-128L, math.min(127L, v)).toByte
      }
      i += 1
    }
    out
  }
}

/** Asymmetric SQ8 scoring kernel: dot product of a float/double query
  * vector against BINARY int8 codes (one signed byte per dimension) —
  * the FAISS-style asymmetric distance computation where the query stays
  * full-precision and only the corpus is quantized. Accumulation is
  * strictly index-ascending, bit-identical to [[DotProduct]] over the
  * unpacked codes and to the oracle's ordered sums. Callers multiply by
  * the per-vector scale to land in the original value range.
  */
case class DotProductSq8(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"DotProductSq8 requires (array<float|double>, binary), got $l / $r"
        )
    }

  private def isFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductSq8.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.DotProductSq8$$.MODULE$$.dot($l, $r, ${if (isFloat) "true" else "false"});")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductSq8 {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def dot(q: ArrayData, codes: Array[Byte], isFloat: Boolean): Double = {
    val n = math.min(q.numElements(), codes.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!q.isNullAt(i)) {
        val x = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
        acc += x * codes(i).toDouble
      }
      i += 1
    }
    acc
  }
}

/** Nearest-centroid assignment kernel — the IVF/PQ argmin
  * `argmin_c (-2·v·c + ||c||²)` as ONE codegen'd expression instead of the
  * `element_at(array_sort(array(k × struct(-2·dot+c², cid))), 1)` tree the
  * struct formulation builds (hundreds of expression nodes per row,
  * measured ~12 ms/vector at k=16×8 subspaces — a scale-killer for PQ
  * training/encoding; this loop is ~1 µs).
  *
  * Bit-exactness contract (what keeps the q72/q85/q114 oracles green):
  *  - the per-centroid dot accumulates strictly index-ascending in doubles,
  *    identical to [[DotProduct]] over `slice(vec, offset+1, dsub)`;
  *  - the score is `-2.0 * dot + c2` with `c2` the driver-side
  *    left-to-right fold of squares — same IEEE operation order as the
  *    struct formulation's literals;
  *  - argmin ordering is array_sort's: nan-safe double compare (NaN
  *    largest, ±0.0 equal), ties broken by the LOWER centroid id
  *    regardless of the order centroids were supplied in.
  *
  * `offset` addresses a contiguous subvector without materializing a
  * slice array — PQ's per-subspace assignment reads the parent vector in
  * place. Null vector → null (the struct formulation poisons the sort
  * instead; embedding tables have no null vectors). Null ELEMENTS are
  * skipped like [[DotProduct]].
  *
  * Centroids ride the case class as Seqs (structural equality keeps plan
  * canonicalization sound) and are flattened to primitive arrays once per
  * plan instance for the eval loop.
  */
case class NearestCentroid(
    child: Expression,
    offset: Int,
    cids: Seq[Long],
    cents: Seq[Seq[Double]]
) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  require(cids.nonEmpty && cids.length == cents.length, "NearestCentroid: cids/cents length mismatch")
  require(cents.forall(_.length == cents.head.length), "NearestCentroid: ragged centroid matrix")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NearestCentroid requires array<float|double>, got $dt"
        )
    }

  @transient private lazy val dsub: Int = cents.head.length
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val flat: Array[Double] = cents.flatten.toArray
  // same left-to-right fold of squares as the struct formulation's driver-side c2
  @transient private lazy val c2Arr: Array[Double] =
    cents.map(_.foldLeft(0.0)((acc, v) => acc + v * v)).toArray

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.assign(v.asInstanceOf[ArrayData], offset, dsub, cidArr, flat, c2Arr, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cidArr, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    val c2Ref = ctx.addReferenceObj("c2", c2Arr, "double[]")
    val fl = if (isFloat) "true" else "false"
    nullSafeCodeGen(
      ctx,
      ev,
      c =>
        s"${ev.value} = graft.plans.NearestCentroid$$.MODULE$$.assign($c, $offset, $dsub, $cidsRef, $flatRef, $c2Ref, $fl);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object NearestCentroid {
  import org.apache.spark.sql.catalyst.util.ArrayData

  /** array_sort's double ordering: NaN largest, ±0.0 equal. */
  private def nanSafeLt(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x < y) -1
    else 1
  }

  def assign(
      arr: ArrayData,
      offset: Int,
      dsub: Int,
      cids: Array[Long],
      flat: Array[Double],
      c2: Array[Double],
      isFloat: Boolean): Long = {
    val vecLen = arr.numElements()
    // slice semantics: at most dsub elements starting at `offset`
    val n = math.max(0, math.min(dsub, vecLen - offset))
    var best = 0.0
    var bestCid = 0L
    var k = 0
    while (k < cids.length) {
      var acc = 0.0
      val base = k * dsub
      var i = 0
      while (i < n) {
        val vi = offset + i
        if (!arr.isNullAt(vi)) {
          val x = if (isFloat) arr.getFloat(vi).toDouble else arr.getDouble(vi)
          acc += x * flat(base + i)
        }
        i += 1
      }
      val score = -2.0 * acc + c2(k)
      if (k == 0) { best = score; bestCid = cids(0) }
      else {
        val cmp = nanSafeLt(score, best)
        if (cmp < 0 || (cmp == 0 && cids(k) < bestCid)) { best = score; bestCid = cids(k) }
      }
      k += 1
    }
    bestCid
  }
}

/** ADC (asymmetric distance computation) serving kernel for PQ: the
  * per-vector distance from m PACKED one-byte codes and the driver-built
  * m×k lookup table of `||q_j − centroid_{j,c}||²` partials —
  * `dist = Σ_j table[j][code_j]`, accumulated left-to-right so the fold is
  * bit-identical to the `reduceLeft(_ + _)` chain of `element_at` lookups
  * (and the oracle's `sum(dist ORDER BY sub)`). Codes index as unsigned
  * bytes, so k up to 256 works when codes are written raw; [[PackInt8]]'s
  * clamp bounds practical k at 128 — ample for the standard k=16/64.
  * Reads m bytes + m doubles per row: the whole point of PQ serving.
  */
case class AdcDistance(child: Expression, table: Seq[Seq[Double]]) extends UnaryExpression {

  require(table.nonEmpty, "AdcDistance: empty table")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"AdcDistance requires binary codes, got $dt"
        )
    }

  @transient private lazy val m: Int = table.length
  @transient private lazy val k: Int = table.head.length
  @transient private lazy val flat: Array[Double] = table.flatten.toArray

  override def nullSafeEval(v: Any): Any =
    AdcDistance.dist(v.asInstanceOf[Array[Byte]], m, k, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("adcTable", flat, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.plans.AdcDistance$$.MODULE$$.dist($c, $m, $k, $flatRef);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object AdcDistance {
  def dist(codes: Array[Byte], m: Int, k: Int, flat: Array[Double]): Double = {
    val n = math.min(m, codes.length)
    var acc = 0.0
    var j = 0
    while (j < n) {
      val code = codes(j) & 0xff
      if (code < k) acc += flat(j * k + code)
      j += 1
    }
    acc
  }
}

object VectorExpressions {

  /** Column API for the codegen'd dot product. */
  def dotNative(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for int8 code packing (array<int> → 1-byte-per-dim binary). */
  def packInt8(a: Column): Column =
    ColumnShim.column(PackInt8(ColumnShim.expression(a)))

  /** Column API for the asymmetric query×int8-codes dot product. */
  def dotSq8(q: Column, codes: Column): Column =
    ColumnShim.column(DotProductSq8(ColumnShim.expression(q), ColumnShim.expression(codes)))

  /** Column API for the fused multi-table LSH bucket expression. */
  def lshBucketsNative(vec: Column, dim: Int, nBits: Int, tables: Int, tableOffset: Int = 0): Column =
    ColumnShim.column(LshBuckets(ColumnShim.expression(vec), dim, nBits, tables, tableOffset))

  /** Column API for the fused nearest-centroid argmin. `offset` addresses a
    * contiguous subvector of `vec` in place (PQ subspaces) — 0 for whole-
    * vector IVF assignment.
    */
  def nearestCentroid(vec: Column, centroids: Seq[(Long, Seq[Double])], offset: Int = 0): Column =
    ColumnShim.column(
      NearestCentroid(ColumnShim.expression(vec), offset, centroids.map(_._1), centroids.map(_._2)))

  /** Column API for the ADC distance over packed PQ codes. */
  def adcDistance(codes: Column, table: Seq[Seq[Double]]): Column =
    ColumnShim.column(AdcDistance(ColumnShim.expression(codes), table))

  /** Register `dot_product` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf"
    )
}
