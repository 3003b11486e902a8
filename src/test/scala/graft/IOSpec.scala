package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Config, StagePath}
import graft.sources.IO

class IOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pipe-CSV round-trip preserves quoting, headers, null sentinel") {
    val tmp = Files.createTempDirectory("graft-io").toString
    val df = Seq(("a|b", "x", Some(1)), ("plain", null, None)).toDF("c1", "c2", "n")
    IO.writePipeCsv(df, s"$tmp/t1")
    val back = IO.readPipeCsv(spark, s"$tmp/t1")
    assert(back.count() == 2)
    assert(back.filter($"c1" === "a|b").count() == 1) // quoted field with the delimiter inside
    // null survives the round trip via the pinned '-' sentinel (the writer
    // must emit it — a default empty field would decay null to "")
    assert(back.filter($"c1" === "plain" && $"c2".isNull).count() == 1)
    assert(back.filter($"c1" === "plain" && $"n".isNull).count() == 1)
  }

  test("multiLine JSON array source (ingest landing format)") {
    val tmp = Files.createTempDirectory("graft-io").toString
    Files.writeString(
      java.nio.file.Paths.get(s"$tmp/doc.json"),
      """[
        |  {"id": 1, "nested": {"v": "x"}},
        |  {"id": 2, "nested": {"v": "y"}}
        |]""".stripMargin
    )
    val df = IO.readJsonDocs(spark, s"$tmp/doc.json")
    assert(df.count() == 2)
    assert(df.select($"nested.v").collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y"))
  }

  test("report CSV: '-' null sentinel handled at scan") {
    val tmp = Files.createTempDirectory("graft-io").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/r.csv"), "a,b\n1,-\n-,2\n")
    val df = IO.readReportCsv(spark, s"$tmp/r.csv")
    val rows = df.collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(0))
  }

  test("StagePath: hive-partitioned grammar") {
    val p = StagePath("/lake", "ad-manager", "line_item", "raw", "json")
    assert(p.forDate(java.time.LocalDate.of(2024, 3, 7)) == "/lake/ad-manager/line_item/raw/json/year=2024/month=03/day=07")
  }

  test("config model parses the reference's DynamoDB item shape") {
    implicit val s = spark
    val cfg = Config.parse(
      """{"source":"ad_manager","services":[{"alias":"line_item","service_name":"LineItemService",
        |"table_name":"tbl_line_item",
        |"transformation_rules":[{"old_column_name":"id","final_column_name":"line_item_id","type":"str"},
        |  {"old_column_name":"costPerUnit","mapping_column_name":"costPerUnit_microAmount",
        |   "final_column_name":"costperunit_microamount","type":"dict"}],
        |"transformation_columns":["order_id","line_item_id"],
        |"masking_cols":["notes"]}]}""".stripMargin.replace("\n", "")
    )
    assert(cfg.source == "ad_manager")
    val svc = cfg.service("line_item").get
    assert(svc.tableName == "tbl_line_item")
    assert(svc.transformationRules.size == 2)
    assert(svc.transformationRules(1).ruleType == "dict")
    assert(svc.transformationRules(1).mappingColumnName.contains("costPerUnit_microAmount"))
    assert(svc.maskingCols == Seq("notes"))
  }

  test("file discovery via glob") {
    val tmp = Files.createTempDirectory("graft-io").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/a.csv"), "x\n1\n")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/b.csv"), "x\n2\n")
    val files = IO.listFiles(spark, s"$tmp/*.csv")
    assert(files.size == 2)
  }
}
