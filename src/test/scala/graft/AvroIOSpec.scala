package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

/** Jar-less Avro container sink/source: spec-compliant logical types
  * (timestamp-micros, local-timestamp-micros, date, decimal bytes),
  * nullable unions, per-task files, and loud refusal of unsupported types.
  */
class AvroIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("avroio").toString

  private val fullSchema = StructType(Seq(
    StructField("b", BooleanType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("l", LongType, nullable = false),
    StructField("f", FloatType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("ntz", TimestampNTZType, nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("dec", DecimalType(18, 2), nullable = true)
  ))

  test("full-type roundtrip: every supported type survives bit-exact, including nulls") {
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("1997-03-05T12:34:56.123456Z"))
    val ntz = java.time.LocalDateTime.parse("1997-03-05T12:34:56.123456")
    val rows = Seq(
      Row(true, 7, 42L, 1.5f, 2.25, "héllo", Array[Byte](1, 2, 3), ts, ntz,
        java.sql.Date.valueOf("1997-03-05"), new java.math.BigDecimal("12345.67")),
      Row(null, null, -9L, null, null, null, null, null, null, null, null)
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), fullSchema)
    val out = tmp()
    AvroIO.writeAvro(df, out)
    val back = AvroIO.readAvro(spark, out)
    assert(back.schema === fullSchema)
    val got = back.orderBy(col("l")).collect()
    assert(got(1).getBoolean(0) === true && got(1).getInt(1) === 7 && got(1).getLong(2) === 42L)
    assert(got(1).getFloat(3) === 1.5f && got(1).getDouble(4) === 2.25 && got(1).getString(5) === "héllo")
    assert(got(1).getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
    assert(got(1).getTimestamp(7) === ts, "timestamp-micros must be exact to the microsecond")
    assert(got(1).getAs[java.time.LocalDateTime](8) === ntz, "local-timestamp-micros must be exact")
    assert(got(1).getDate(9) === java.sql.Date.valueOf("1997-03-05"))
    assert(got(1).getDecimal(10) === new java.math.BigDecimal("12345.67"))
    assert((0 until 11).filter(_ != 2).forall(got(0).isNullAt), "nullable union must carry nulls")
  }

  test("negative and sub-second-boundary timestamps roundtrip (floorDiv path)") {
    val pre1970 = java.sql.Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.999999Z"))
    val schema = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row(pre1970)), 1), schema)
    val out = tmp()
    AvroIO.writeAvro(df, out)
    assert(AvroIO.readAvro(spark, out).collect()(0).getTimestamp(0) === pre1970)
  }

  test("decimal written at the declared scale regardless of input scale") {
    val schema = StructType(Seq(StructField("dec", DecimalType(10, 3), nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(new java.math.BigDecimal("5"))), 1), schema)
    val out = tmp()
    AvroIO.writeAvro(df, out)
    assert(AvroIO.readAvro(spark, out).collect()(0).getDecimal(0) === new java.math.BigDecimal("5.000"))
  }

  test("one container file per non-empty partition; empty partitions write nothing") {
    import spark.implicits._
    val df = (1L to 100L).toDF("x").repartition(8)
    val out = tmp()
    AvroIO.writeAvro(df, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 8)
    assert(AvroIO.readAvro(spark, out).as[Long].collect().sorted.toSeq === (1L to 100L))
  }

  test("unsupported type refused loudly BEFORE the target is cleared") {
    import spark.implicits._
    val out = tmp()
    AvroIO.writeAvro((1L to 3L).toDF("x"), out)
    val bad = Seq((1L, Seq("a", "b"))).toDF("x", "arr")
    val e = intercept[IllegalArgumentException](AvroIO.writeAvro(bad, out))
    assert(e.getMessage.contains("does not support"))
    // prior export must still be readable — refusal happened before delete
    assert(AvroIO.readAvro(spark, out).count() === 3L)
  }

  test("schema mapping is its own inverse on the supported surface") {
    assert(AvroIO.structType(AvroIO.avroSchema(fullSchema)) === fullSchema)
  }

  test("a partial directory without _SUCCESS is refused, not read as complete") {
    import spark.implicits._
    val out = tmp()
    AvroIO.writeAvro((1L to 10L).toDF("x"), out)
    // simulate a job that died after some tasks committed
    assert(new java.io.File(s"$out/_SUCCESS").delete())
    val e = intercept[IllegalArgumentException](AvroIO.readAvro(spark, out))
    assert(e.getMessage.contains("_SUCCESS"), s"wrong refusal: ${e.getMessage}")
    // externally-written trees (reference avro tools write no marker)
    // opt out explicitly and read fine (ADVICE r13 #3)
    val got = AvroIO.readAvro(spark, out, requireSuccessMarker = false)
      .as[Long].collect().sorted.toSeq
    assert(got === (1L to 10L), s"opt-out read must see all rows: $got")
  }

  test("an abandoned rowIterator is closeable early and close is idempotent") {
    import spark.implicits._
    val out = tmp()
    AvroIO.writeAvro((1L to 100L).toDF("x"), out)
    val f = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro")).head
    val it = AvroIO.rowIterator(
      new java.io.ByteArrayInputStream(java.nio.file.Files.readAllBytes(f.toPath)),
      Array(LongType))
    assert(it.hasNext)
    it.next() // consume one row, then abandon — the limit/take shape
    it.close()
    it.close() // idempotent
    assert(!it.hasNext, "a closed iterator must report exhaustion, not decode more")
    // and the end-to-end limit path (which abandons per-file iterators
    // under the task-completion hook) still returns correct rows
    assert(AvroIO.readAvro(spark, out).limit(3).count() === 3L)
  }

  test("rowIterator streams: first row decodes before the container's tail is read") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // hand-build a container with a SMALL sync interval so it holds many
    // blocks — laziness is per-block, a single-block file proves nothing
    val schema = AvroIO.avroSchema(StructType(Seq(StructField("s", StringType, nullable = false))))
    val baos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1 << 12)
    w.create(schema, baos)
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put(0, s"row-$i " + rnd.alphanumeric.take(200).mkString) // incompressible-ish
      w.append(rec)
    }
    w.close()
    val bytes = baos.toByteArray
    var consumed = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(bytes)
      override def read(): Int = { val b = in.read(); if (b != -1) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
    }
    val it = AvroIO.rowIterator(counting, Array(StringType))
    assert(it.next().getString(0).startsWith("row-0"))
    assert(consumed < bytes.length / 2,
      s"read $consumed of ${bytes.length} bytes for the first of 2000 rows — not streaming")
    assert(it.size === 1999) // drain cleanly
  }
}
