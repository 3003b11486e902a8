package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recursive document flattening (R6) and nested extraction (P2-P4).
  *
  * The reference flattens every raw JSON document with `flatten_json.flatten`
  * (cleansing.py:32-33): nested dicts AND lists become `a_b_0_c` columns,
  * with the output schema being the union of keys across documents. In Spark
  * the schema is known up front (from `spark.read.json` inference or the
  * config registry), so flattening is a pure compile-time `select` of every
  * leaf path — no per-row work at all, fully codegen'd, and column pruning
  * still reaches the parquet/JSON scan because the select is declarative.
  *
  * List handling: `flatten_json` inlines list indices (`tags_0`, `tags_1`).
  * We replicate that with a bounded index projection (`element_at`) — the
  * bound comes from the observed max length at plan time or a caller cap.
  * The alternative (`posexplode`) changes cardinality, which the cleansing
  * stage must not do.
  */
object Flatten {

  /** All leaf paths of a schema as (dotted-path, flattened-name, DataType). */
  def leafPaths(schema: StructType, prefix: String = "", sep: String = "_"): Seq[(String, String, DataType)] = {
    schema.fields.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val flat = path.replace(".", sep)
      f.dataType match {
        case s: StructType => leafPaths(s, path, sep)
        case dt            => Seq((path, flat, dt))
      }
    }
  }

  /** Flatten all nested structs into `a_b_c` columns (one `select`). Arrays
    * are kept as-is unless `listIndexBound > 0`, in which case arrays of
    * scalars/structs are expanded to `name_0..name_{bound-1}` columns
    * (flatten_json parity; missing indices are null; elements BEYOND the
    * bound are dropped — pick the bound from the data, e.g. via
    * [[observedMaxListLength]], when lossless expansion is required).
    *
    * Columns are navigated by getField chaining (never dotted col() strings),
    * so field names containing '.' flatten correctly.
    */
  def flattenAll(df: DataFrame, sep: String = "_", listIndexBound: Int = 0): DataFrame = {
    def expandCol(c: Column, flat: String, dt: DataType): Seq[Column] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f => expandCol(c.getField(f.name), s"$flat$sep${f.name}", f.dataType))
      case ArrayType(elem, _) if listIndexBound > 0 =>
        (0 until listIndexBound).flatMap { i =>
          // try_element_at: out-of-bound indices yield null (flatten_json
          // parity for ragged lists) instead of ANSI errors
          val itemCol = try_element_at(c, lit(i + 1))
          elem match {
            case es: StructType =>
              es.fields.toSeq.flatMap { f =>
                expandCol(itemCol.getField(f.name), s"$flat$sep$i$sep${f.name}", f.dataType)
              }
            case _ => Seq(itemCol.as(s"$flat$sep$i"))
          }
        }
      case _ => Seq(c.as(flat))
    }
    val cols = df.schema.fields.flatMap(f => expandCol(df(s"`${f.name}`"), f.name, f.dataType))
    df.select(cols.toSeq: _*)
  }

  /** Largest array length present for each top-level array column — the
    * lossless `listIndexBound` for [[flattenAll]] (one aggregation pass).
    */
  def observedMaxListLength(df: DataFrame): Int = {
    import org.apache.spark.sql.types._
    val arrayCols = df.schema.fields.collect { case StructField(n, _: ArrayType, _, _) => n }.toSeq
    if (arrayCols.isEmpty) 0
    else {
      val sizes = arrayCols.map(c => coalesce(max(size(col(s"`$c`"))), lit(0)))
      val m = df.agg(if (sizes.length == 1) sizes.head else greatest(sizes: _*)).head().getInt(0)
      math.max(0, m)
    }
  }

  /** P2: one-level nested extraction with `old_` prefix — pull a dotted
    * field path out of a struct column. Schema-checked: paths absent from
    * this batch's schema resolve to a typed null column instead of failing
    * analysis, matching the reference's `json_normalize` + reindex behavior
    * (transformation.py:262-280).
    */
  def extractField(df: DataFrame, structCol: String, dottedField: String): Column = {
    import org.apache.spark.sql.types._
    def walk(dt: DataType, c: Column, parts: List[String]): Option[Column] = (dt, parts) match {
      case (_, Nil) => Some(c)
      case (s: StructType, h :: t) =>
        s.fields.find(_.name == h).flatMap(f => walk(f.dataType, c.getField(h), t))
      case _ => None
    }
    df.schema.fields
      .find(_.name == structCol)
      .flatMap(f => walk(f.dataType, df(s"`$structCol`"), dottedField.split('.').toList))
      .getOrElse(lit(null).cast("string"))
  }

  /** P4: deep get with default — null-VALUE-safe struct navigation with a
    * fallback (reference deep_get, transformation.py:243-244). The path must
    * exist in the schema (it's Column-based); for schema-missing paths use
    * [[extractField]], which degrades to null instead of failing analysis.
    */
  def deepGetOrElse(structCol: Column, path: Seq[String], default: Column): Column =
    coalesce(path.foldLeft(structCol)((c, f) => c.getField(f)), default)

  /** F3: header normalization — lowercase, spaces to underscores, strip a
    * dotted prefix (ingestion.py:89-91). Driver-side rename, zero runtime
    * cost.
    */
  def normalizeHeader(name: String): String = {
    val lastDot = name.lastIndexOf('.')
    val stripped = if (lastDot >= 0) name.substring(lastDot + 1) else name
    stripped.toLowerCase.replace(" ", "_")
  }

  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeHeader).toIndexedSeq: _*)

  /** Schema reconciliation (ingestion.py:92-123): align a drifting report
    * DataFrame to a registry column list — add missing columns as nulls,
    * keep registry order, return (aligned df, newly-seen columns appended at
    * the end). This is the engine's "self-healing drift" pass.
    */
  def reconcileSchema(df: DataFrame, registry: Seq[String]): (DataFrame, Seq[String]) = {
    val have = df.columns.toSet
    val newCols = df.columns.filterNot(registry.contains).toSeq
    val ordered = registry ++ newCols
    val cols = ordered.map(c => if (have.contains(c)) col(c) else lit(null).cast("string").as(c))
    (df.select(cols: _*), newCols)
  }
}
