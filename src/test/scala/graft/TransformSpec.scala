package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TransformationRule
import graft.operators.{Flatten, Transform}

/** Transformation-stage semantics against the reference's data shapes
  * (FIXTURES.md B1): rule projection, nested extraction, explodes with
  * empty-list row-drop, null sentinel, float->long, header normalization,
  * schema-drift reconciliation.
  */
class TransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Miniature raw line_item document (FIXTURES.md B1 shape). */
  private lazy val raw = {
    val json = Seq(
      """{"orderId":1001,"id":5001,"name":"li-A","costPerUnit":{"currencyCode":"USD","microAmount":1500000},
        |"startDateTime":{"date":{"year":2023,"month":5,"day":1},"hour":0,"minute":0,"second":0,"timeZoneId":"Asia/Kuala_Lumpur"},
        |"targeting":{"geoTargeting":{"targetedLocations":[{"id":2458,"type":"COUNTRY","canonicalParentId":null,"displayName":"Malaysia"}]},
        |  "inventoryTargeting":{"targetedAdUnits":[{"adUnitId":"77001","includeDescendants":true},{"adUnitId":"77002","includeDescendants":false}]}},
        |"customFieldValues":[{"customFieldId":901,"value":{"value":"tier-1"}}]}""".stripMargin.replace("\n", ""),
      """{"orderId":1002,"id":5002,"name":"li-B","costPerUnit":{"currencyCode":"MYR","microAmount":900000},
        |"startDateTime":{"date":{"year":2017,"month":1,"day":2},"hour":1,"minute":2,"second":3,"timeZoneId":"UTC"},
        |"targeting":{"geoTargeting":{"targetedLocations":[]},"inventoryTargeting":{"targetedAdUnits":[]}},
        |"customFieldValues":[]}""".stripMargin.replace("\n", "")
    )
    spark.read.json(json.toDS)
  }

  test("P1/P2/P3: config-driven rename + nested + double-nested extraction") {
    val rules = Seq(
      TransformationRule("id", "line_item_id"),
      TransformationRule("orderId", "order_id"),
      TransformationRule("costPerUnit", "costperunit_microamount", Some("costPerUnit_microAmount"), "dict"),
      TransformationRule("startDateTime", "start_datetime_date_year", Some("startDateTime_date_year"), "dict"),
      TransformationRule("startDateTime", "start_datetime_timezoneid", Some("startDateTime_timeZoneId"), "dict"),
      TransformationRule("missing_col", "ghost") // absent -> null column
    )
    val out = Transform.applyRules(raw, rules)
    assert(out.columns.toSeq == Seq("line_item_id", "order_id", "costperunit_microamount",
      "start_datetime_date_year", "start_datetime_timezoneid", "ghost"))
    val a = out.filter($"line_item_id" === 5001).head()
    assert(a.getLong(2) == 1500000L)
    assert(a.getLong(3) == 2023L)
    assert(a.getString(4) == "Asia/Kuala_Lumpur")
    assert(a.isNullAt(5))
  }

  test("R2/R3/R4: explodes drop empty-list rows (np.repeat semantics)") {
    val geo = Transform.explodeGeoTargeting(raw, Seq("orderId", "id"))
    assert(geo.count() == 1) // li-B's empty targetedLocations drops the row
    val g = geo.head()
    assert(g.getLong(2) == 2458L && g.getString(3) == "COUNTRY" && g.getString(5) == "Malaysia")

    val au = Transform.explodeTargetedAdUnits(raw, Seq("orderId", "id"))
    assert(au.count() == 2)
    assert(au.select("targetting_type").distinct().head().getString(0) == "targetted")

    val cf = Transform.explodeCustomFields(raw, Seq("orderId", "id"))
    assert(cf.count() == 1)
    assert(cf.head().getString(3) == "tier-1")
  }

  test("side outputs subset to configured expand_columns (reference reindex semantics)") {
    import graft.core.ServiceConfig
    // configs migrated from the reference use FINAL column names — the side
    // frame is the rule-transformed copy plus the derived explode columns
    // (transformation.py:325-389)
    val svc = ServiceConfig(
      alias = "line_item",
      transformationRules = Seq(TransformationRule("id", "line_item_id"), TransformationRule("orderId", "order_id")),
      expandColumns = Seq("order_id", "line_item_id", "adunit_id", "targetting_type", "ghost_col"),
      expandColumnsCustomField = Seq("line_item_id", "custom_field_value")
    )
    val (_, sides) = Transform.forService(raw, svc, applyYearFilter = false)
    val au = sides("line_item_targetted_ad_unit")
    assert(au.columns.toSeq == Seq("order_id", "line_item_id", "adunit_id", "targetting_type", "ghost_col"))
    val row = au.orderBy($"adunit_id").head()
    assert(row.getLong(0) == 1001L && row.getLong(1) == 5001L) // final-named ids resolve
    assert(au.filter($"ghost_col".isNull).count() == au.count()) // missing configured col -> typed nulls
    assert(sides("line_item_custom_field").columns.toSeq == Seq("line_item_id", "custom_field_value"))
    // geo side has no configured list -> compact (raw ids + derived) shape
    assert(sides("line_item_targeting_locations").columns.contains("location_name"))
    // the null-padded frame must survive a CSV write (typed nulls, no VoidType)
    val tmp = java.nio.file.Files.createTempDirectory("graft-side").toString
    graft.sources.IO.writePipeCsv(au, s"$tmp/au")
    assert(graft.sources.IO.readPipeCsv(spark, s"$tmp/au").count() == au.count())
  }

  test("P6: year filter keeps only >= 2019 (applied per configured service)") {
    val rules = Seq(
      TransformationRule("id", "line_item_id"),
      TransformationRule("startDateTime", "start_datetime_date_year", Some("startDateTime_date_year"), "dict")
    )
    val out = Transform.yearFilter(Transform.applyRules(raw, rules), "start_datetime_date_year")
    assert(out.count() == 1)
    assert(out.head().getLong(0) == 5001L)
  }

  test("P11: '-' null sentinel normalization") {
    val df = Seq(("a", "-"), ("-", "x")).toDF("c1", "c2")
    val out = Transform.nullSentinel(df).collect()
    assert(out(0).getString(0) == "a" && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).getString(1) == "x")
  }

  test("F2: float columns -> NaN/null->0 -> truncating long cast") {
    val df = Seq((1.9, Some(2.5)), (Double.NaN, None)).toDF("a", "b")
    val out = Transform.floatColumnsToLong(df).collect()
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(out(1).getLong(0) == 0L && out(1).getLong(1) == 0L)
  }

  test("F1: generic spares + injected insrt_ts clock") {
    val df = Seq(("x", 1)).toDF("k", "v")
    val out = Transform.addGenericAndTimestamp(df, lit("2024-01-01 00:00:01").cast("timestamp"))
    assert(out.columns.count(_.startsWith("generic")) == 10)
    assert(out.head().getTimestamp(out.columns.length - 1).toString == "2024-01-01 00:00:01.0")
  }

  test("F3: header normalization strips dotted prefixes (ingestion.py:89-91)") {
    assert(Flatten.normalizeHeader("Dimension.AD_UNIT_ID") == "ad_unit_id")
    assert(Flatten.normalizeHeader("Total Impressions") == "total_impressions")
  }

  test("schema drift reconciliation: add-null for missing, append new") {
    val df = Seq((1, "x")).toDF("a", "newcol")
    val (aligned, fresh) = Flatten.reconcileSchema(df, Seq("a", "b"))
    assert(aligned.columns.toSeq == Seq("a", "b", "newcol"))
    assert(aligned.head().isNullAt(1))
    assert(fresh == Seq("newcol"))
  }

  test("R6: recursive flatten with bounded list-index expansion") {
    val flat = Flatten.flattenAll(raw, listIndexBound = 2)
    val cols = flat.columns.toSet
    assert(cols.contains("costPerUnit_microAmount"))
    assert(cols.contains("startDateTime_date_year"))
    assert(cols.contains("targeting_geoTargeting_targetedLocations_0_displayName"))
    assert(cols.contains("customFieldValues_0_value_value"))
    val a = flat.filter($"id" === 5001).head()
    assert(a.getAs[String]("targeting_geoTargeting_targetedLocations_0_displayName") == "Malaysia")
    // bounded index beyond list length -> null
    assert(a.getAs[Any]("targeting_geoTargeting_targetedLocations_1_displayName") == null)
  }

  test("goldenRecord: per-field latest-non-null wins independently; all-null field stays null") {
    val rows = Seq(
      // entity A: newest row (o=3) misses brand — brand must survive from o=2
      ("A", 1L, Some("b1"), Some("t1")),
      ("A", 2L, Some("b2"), None),
      ("A", 3L, None, Some("t3")),
      // entity B: field t null everywhere
      ("B", 1L, Some("bX"), None)
    ).toDF("ent", "o", "brand", "t")
    val out = Transform.goldenRecord(rows, "ent", "o", Seq("brand", "t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(out(0) == ("A", "b2", "t3"), s"got ${out(0)}")
    assert(out(1) == ("B", "bX", null))
    assertThrows[IllegalArgumentException](Transform.goldenRecord(rows, "ent", "o", Nil))
  }
}
