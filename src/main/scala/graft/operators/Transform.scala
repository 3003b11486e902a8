package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.core.{ServiceConfig, TransformationRule}

/** Config-driven transformation stage (SURVEY.md §2.2/§2.5/§2.7).
  *
  * The reference builds a new pandas frame column-by-column from
  * `transformation_rules` (transformation.py:259-283), explodes nested
  * targeting/custom-field lists into side outputs (:323-389), applies the
  * 2019 year filter (:399-402) and scalar conversions (:59-75), then writes
  * one main CSV plus up to 4 side CSVs. Here every rule compiles into a
  * single declarative `select`, so Catalyst prunes the source scan down to
  * exactly the consumed leaf fields and the whole stage is one codegen'd
  * pass — no row-wise apply anywhere.
  */
object Transform {

  /** P1/P2/P3: compile the rule list into one projection.
    * `str` rules are a rename; `dict` rules navigate the nested path encoded
    * in `mapping_column_name` as `parent_child_grandchild` (the reference's
    * json_normalize flattening used `_`-joined names; we map them back onto
    * real struct paths). Unknown/missing columns become typed nulls, matching
    * the reference's reindex-with-NaN.
    */
  def applyRules(df: DataFrame, rules: Seq[TransformationRule]): DataFrame =
    df.select(rules.map(r => ruleExpr(df, r).as(r.finalColumnName)): _*)

  /** The column expression one rule compiles to. */
  def ruleExpr(df: DataFrame, r: TransformationRule): Column = {
    val top = df.columns.toSet
    if (r.ruleType == "dict") {
      r.mappingColumnName match {
        case Some(mapping) if top.contains(r.oldColumnName) =>
          // mapping is `old_a_b` or `old_a` — strip the leading old column
          // name, the rest is the struct path
          val rest = mapping.stripPrefix(r.oldColumnName).stripPrefix("_")
          structPath(df, r.oldColumnName, rest)
        case _ => lit(null).cast("string")
      }
    } else if (top.contains(r.oldColumnName)) col(r.oldColumnName)
    else lit(null).cast("string")
  }

  /** Resolve `a_b_c`-style flattened names onto the real nested schema.
    * Field names may themselves contain underscores, so candidate prefixes
    * are tried longest-first WITH backtracking: a longer sibling name that
    * dead-ends must not shadow a shorter prefix whose subtree resolves.
    * Unresolvable paths yield a typed null (VoidType would crash the CSV
    * sink downstream).
    */
  private def structPath(df: DataFrame, topCol: String, flatRest: String): Column = {
    import org.apache.spark.sql.types._
    def walk(dt: DataType, c: Column, rest: String): Option[Column] =
      if (rest.isEmpty) Some(c)
      else
        dt match {
          case s: StructType =>
            s.fields
              .filter(f => rest == f.name || rest.startsWith(f.name + "_"))
              .sortBy(-_.name.length)
              .iterator
              .map(f => walk(f.dataType, c.getField(f.name), rest.stripPrefix(f.name).stripPrefix("_")))
              .collectFirst { case Some(resolved) => resolved }
          case _ => None
        }
    df.schema.fields
      .find(_.name == topCol)
      .flatMap(f => walk(f.dataType, col(topCol), flatRest))
      .getOrElse(lit(null).cast("string"))
  }

  /** P5: ordered column subset; names absent from df become (string-typed)
    * null columns — reference reindex semantics. The cast matters: an
    * untyped null is VoidType, which the CSV sink rejects at write.
    */
  def subset(df: DataFrame, columns: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    df.select(columns.map(c => if (have.contains(c)) col(c) else lit(null).cast("string").as(c)): _*)
  }

  /** P6: start-year filter, applied only to the configured services
    * (transformation.py:33,399-402).
    */
  def yearFilter(df: DataFrame, yearCol: String, minYear: Int = 2019): DataFrame =
    df.filter(col(yearCol) >= minYear)

  /** P10: PII masking — drop configured columns (partitioning.py:63-69). */
  def mask(df: DataFrame, maskingCols: Seq[String]): DataFrame =
    df.drop(maskingCols: _*)

  /** P11: `-` null-sentinel normalization across all string columns
    * (ingestion.py:83). When reading through IO.readReportCsv this is already
    * handled by the csv nullValue option; this is the in-flight variant.
    */
  def nullSentinel(df: DataFrame, sentinel: String = "-"): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        when(col(f.name) === sentinel, lit(null)).otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** F1: append generic1..generic10 null spares + `insrt_ts`. Clock is
    * injected for deterministic backfill (`hist` mode stamps date+1s,
    * transformation.py:59-67).
    */
  def addGenericAndTimestamp(df: DataFrame, insrtTs: Column, spares: Int = 10): DataFrame = {
    val withSpares = (1 to spares).foldLeft(df)((d, i) => d.withColumn(s"generic$i", lit(null).cast("string")))
    withSpares.withColumn("insrt_ts", insrtTs)
  }

  /** F2: every float/double column -> NaN/null->0 -> truncate to long
    * (transformation.py:70-75).
    */
  def floatColumnsToLong(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          coalesce(nanvl(col(f.name).cast("double"), lit(0.0)), lit(0.0)).cast("long").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** R1: generic row explode — one output row per element; rows with
    * empty/null lists are DROPPED (np.repeat-by-length semantics,
    * transformation.py:45-56). Spark's `explode` (not explode_outer) matches
    * exactly.
    */
  def extendColumnsInRows(df: DataFrame, listCol: String): DataFrame =
    df.withColumn(listCol, explode(col(listCol)))

  /** R2: geo-targeting side output (transformation.py:323-345). */
  def explodeGeoTargeting(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.withColumn(
      "__loc",
      explode(coalesce(col("targeting.geoTargeting.targetedLocations"), array()))
    ).select(
      idCols.map(col) ++ Seq(
        col("__loc.id").as("location_id"),
        col("__loc.type").as("location_type"),
        col("__loc.canonicalParentId").as("canonical_parent_id"),
        col("__loc.displayName").as("location_name")
      ): _*
    )

  /** R3: inventory-targeting side output with the literal `targetting_type`
    * (transformation.py:348-370) — applied to both line_item and
    * proposal_line_item.
    */
  def explodeTargetedAdUnits(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.withColumn(
      "__au",
      explode(coalesce(col("targeting.inventoryTargeting.targetedAdUnits"), array()))
    ).select(
      idCols.map(col) ++ Seq(
        col("__au.adUnitId").as("adunit_id"),
        col("__au.includeDescendants").as("include_descendants"),
        lit("targetted").as("targetting_type")
      ): _*
    )

  /** R4: custom-field side output, null-safe nested `value.value`
    * (transformation.py:373-389).
    */
  def explodeCustomFields(df: DataFrame, idCols: Seq[String]): DataFrame =
    df.withColumn("__cf", explode(coalesce(col("customFieldValues"), array())))
      .select(
        idCols.map(col) ++ Seq(
          col("__cf.customFieldId").as("custom_field_id"),
          col("__cf.value.value").as("custom_field_value")
        ): _*
      )

  /** R5: first array element (label.type = types[0], transformation.py:392-393). */
  def firstElement(c: Column): Column = element_at(c, 1)

  /** Full service transformation: rules -> projection, optional explodes into
    * side outputs, subset, year filter. Returns (main, sideOutputs by name).
    */
  def forService(df: DataFrame, svc: ServiceConfig, applyYearFilter: Boolean): (DataFrame, Map[String, DataFrame]) = {
    val idCols = Seq("orderId", "id").filter(df.columns.contains)
    // Side outputs in the reference are built from a COPY of the rule-
    // transformed frame (final column names) with the derived explode
    // columns added, then subset to expand_columns (transformation.py:
    // 325-389: df_expand = df_new.copy(); ...; df_expand[expand_columns]).
    // So the subset must resolve against raw + final + derived names.
    val withFinals = {
      // on name collision the RULE value wins (the reference's df_new always
      // holds transformed values) — the colliding raw column is replaced
      val finalNames = svc.transformationRules.map(_.finalColumnName).toSet
      val rawCols = df.columns.toSeq.filterNot(finalNames.contains)
      val finalCols = svc.transformationRules.map(r => ruleExpr(df, r).as(r.finalColumnName))
      df.select(rawCols.map(col) ++ finalCols: _*)
    }
    // With a configured list: subset the final-named frame + derived cols.
    // Without: the compact (rawIds + derived) shape.
    def side(explodedFull: DataFrame, compact: DataFrame, cols: Seq[String]): DataFrame =
      if (cols.nonEmpty) subset(explodedFull, cols) else compact
    val allIds = withFinals.columns.toSeq.filterNot(c => Seq("targeting", "customFieldValues").contains(c))
    val sides = scala.collection.mutable.Map[String, DataFrame]()
    if (hasPath(df, "targeting.geoTargeting.targetedLocations"))
      sides += s"${svc.alias}_targeting_locations" ->
        side(
          explodeGeoTargeting(withFinals, allIds),
          explodeGeoTargeting(df, idCols),
          svc.expandColumnsTargetingLocation
        )
    if (hasPath(df, "targeting.inventoryTargeting.targetedAdUnits"))
      sides += s"${svc.alias}_targetted_ad_unit" ->
        side(
          explodeTargetedAdUnits(withFinals, allIds),
          explodeTargetedAdUnits(df, idCols),
          svc.expandColumns
        )
    if (df.columns.contains("customFieldValues"))
      sides += s"${svc.alias}_custom_field" ->
        side(
          explodeCustomFields(withFinals, allIds),
          explodeCustomFields(df, idCols),
          svc.expandColumnsCustomField
        )

    var main = applyRules(df, svc.transformationRules)
    if (svc.transformationColumns.nonEmpty) main = subset(main, svc.transformationColumns)
    if (applyYearFilter && main.columns.contains("start_datetime_date_year"))
      main = yearFilter(main, "start_datetime_date_year")
    (main, sides.toMap)
  }

  /** GOLDEN-RECORD SURVIVORSHIP MERGE (the MDM step after entity
    * resolution): one merged record per entity where EACH FIELD is
    * resolved independently by "latest non-null wins" — the newest
    * (by `orderCol`) row carrying a value for that field supplies it,
    * so a recent row with a missing attribute does not erase an older
    * row's value. `orderCol` must be unique within an entity (a commit
    * sequence / partkey), making the rule total and deterministic.
    *
    * Implementation: one hash aggregation, each field folded as
    * max(struct(non-null flag, order, value)) — a single shuffle on the
    * entity key regardless of field count, no per-field window passes
    * (f windows would sort the entity's rows f times).
    */
  def goldenRecord(df: DataFrame, entityCol: String, orderCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord: fields must be non-empty")
    val aggs = fields.map { f =>
      max(struct(col(f).isNotNull.cast("int").as("nn"), col(orderCol).as("o"), col(f).as("v")))
        .getField("v").as(f)
    }
    df.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
  }

  private def hasPath(df: DataFrame, dotted: String): Boolean = {
    import org.apache.spark.sql.types._
    def walk(dt: DataType, parts: List[String]): Boolean = (dt, parts) match {
      case (_, Nil)              => true
      case (s: StructType, h :: t) => s.fields.find(_.name == h).exists(f => walk(f.dataType, t))
      case _                     => false
    }
    val parts = dotted.split('.').toList
    df.schema.fields.find(_.name == parts.head).exists(f => walk(f.dataType, parts.tail))
  }
}
