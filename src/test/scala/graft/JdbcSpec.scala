package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** End-to-end JDBC warehouse adapter against embedded Derby — the same
  * Spark JDBC datasource code path a Redshift/Postgres deployment uses,
  * only URL and driver differ.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def derbyUrl(): String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("distributed write + read round-trip; overwrite replaces, append adds") {
    val url = derbyUrl()
    val df = (1L to 100L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "score")

    Jdbc.writeTable(df.repartition(4), url, "t_load", coalesceTo = Some(2))
    val back = Jdbc.readTable(spark, url, "t_load")
    assert(back.count() == 100)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("id", "name", "score"))
    assert(back.agg(sum($"id")).head().get(0).toString.toDouble == 5050.0)

    // overwrite = the reference's truncate+load staging swap
    Jdbc.writeTable(df.filter($"id" <= 10), url, "t_load", SaveMode.Overwrite)
    assert(Jdbc.readTable(spark, url, "t_load").count() == 10)

    // append = incremental load
    Jdbc.writeTable(df.filter($"id" > 90), url, "t_load", SaveMode.Append)
    assert(Jdbc.readTable(spark, url, "t_load").count() == 20)
  }

  test("range-partitioned parallel read sees every row exactly once") {
    val url = derbyUrl()
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "grp")
    Jdbc.writeTable(df, url, "t_part")

    val part = Jdbc.readPartitioned(spark, url, "t_part", "id", 1, 1000, 8)
    assert(part.rdd.getNumPartitions == 8) // genuinely parallel scans
    assert(part.count() == 1000) // no row lost or duplicated at range bounds
    assert(part.select(countDistinct($"id")).head().getLong(0) == 1000)
    // same content as the serial read
    val serial = Jdbc.readTable(spark, url, "t_part")
    assert(
      part.orderBy("id").collect().map(_.toSeq).toSeq ==
        serial.orderBy("id").collect().map(_.toSeq).toSeq
    )
  }
}
