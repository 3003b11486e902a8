package graft.sources

import java.io.ByteArrayInputStream
import java.math.BigInteger
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container source/sink with NO connector jar: Spark ships core
  * Avro (it backs its shuffle serialization and our Iceberg manifest
  * walk), so the row-oriented interchange format of Kafka/registry
  * estates is available from the classes already on every executor.
  *
  * Logical types follow the public Avro spec so files interoperate with
  * any standard reader: `timestamp-micros` on long, `date` on int,
  * `decimal(p,s)` as unscaled big-endian bytes; nullable Spark fields map
  * to `union(null, T)`. Unsupported Spark types are refused loudly at
  * write time — silent coercion is how interchange corpora rot.
  *
  * Scale shape: the writer emits one container file per task (no
  * driver funnel, no shuffle) with deflate block compression; the reader
  * maps one task per file and streams records out of the container
  * blocks. Container files are block-splittable in principle; one task
  * per file is the right grain here because the writer already bounds
  * file size by task partitioning — re-partition upstream to size files,
  * exactly like the parquet path.
  */
object AvroIO {

  /** Spark field type → Avro schema (base, before the nullable union). */
  private def baseSchema(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType => LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType => LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case other => throw new IllegalArgumentException(
      s"AvroIO does not support Spark type $other — project it to a supported type before the sink")
  }

  def avroSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = baseSchema(f.dataType)
      val s = if (f.nullable) Schema.createUnion(java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, s)
    }
    Schema.createRecord("spark_row", null, "graft", false, java.util.Arrays.asList(fields: _*))
  }

  /** Avro schema → Spark StructType (inverse of [[avroSchema]], accepts
    * any spec-compliant record of the supported primitive/logical types).
    */
  def structType(schema: Schema): StructType = {
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"only union(null, T) is supported, got $s")
        (nonNull.head, true)
      } else (s, false)
    def dataType(s: Schema): DataType = (s.getType, Option(s.getLogicalType)) match {
      case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
      case (Schema.Type.LONG, Some(_: LogicalTypes.LocalTimestampMicros)) => TimestampNTZType
      case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
      case (Schema.Type.BYTES, Some(d: LogicalTypes.Decimal)) => DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, _) => BinaryType
      case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (base, nullable) = unwrap(f.schema())
      StructField(f.name(), dataType(base), nullable)
    }.toArray)
  }

  /** Row external value → Avro generic value (base representations — no
    * Conversion registry needed; logical types ride their base type).
    */
  private def toAvro(v: Any, dt: DataType, declaredScale: Int): Any = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case ldt: java.time.LocalDateTime =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case dec: java.math.BigDecimal => ByteBuffer.wrap(dec.setScale(declaredScale).unscaledValue().toByteArray)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other // boolean / int / long / float / double / String pass through
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      val micros = l.longValue()
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    case (l: java.lang.Long, TimestampNTZType) =>
      val micros = l.longValue()
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (b: ByteBuffer, d: DecimalType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      new java.math.BigDecimal(new BigInteger(arr), d.scale)
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      arr
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (other, _) => other
  }

  /** Sink: one Avro container file per non-empty task partition under
    * `path` (cleared first — overwrite semantics, like the parquet sink).
    *
    * COMMIT PROTOCOL (ADVICE r12): the directory is only readable once
    * every task finished — a `_SUCCESS` marker lands after the job
    * completes, and [[readAvro]] refuses a directory without it. A job
    * that dies after some tasks committed leaves a marker-less partial
    * directory that reads as the loud failure it is, never as a silently
    * complete dataset. (Task RETRIES are already safe — each partition
    * overwrites its own deterministic part file.)
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val st = df.schema
    st.fields.foreach(f => baseSchema(f.dataType)) // refuse unsupported types BEFORE clearing the target
    val schemaJson = avroSchema(st).toString
    val dir = new Path(path)
    val fs = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val scales = st.fields.map {
      case StructField(_, d: DecimalType, _, _) => d.scale
      case _ => 0
    }
    val dts = st.fields.map(_.dataType)
    // session Hadoop conf shipped to tasks: object-store credentials,
    // endpoints and custom schemes must be visible on the executor
    val serConf = new graft.core.SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val p = new Path(f"$path%s/part-$pid%05d.avro")
        val pfs = p.getFileSystem(serConf.value)
        val out = pfs.create(p, true)
        val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        writer.setCodec(CodecFactory.deflateCodec(6))
        writer.create(schema, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < dts.length) {
              rec.put(i, toAvro(if (row.isNullAt(i)) null else row.get(i), dts(i), scales(i)))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close() // closes the FS stream too
      }
    }
    // all tasks done — publish the directory
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  /** Lazy row iterator over one container stream: records decode as the
    * consumer pulls (container blocks stream one at a time — per-task
    * memory O(block), never O(file)). The stream closes on exhaustion;
    * a consumer that ABANDONS the iterator early (limit/take/first)
    * must call [[java.io.Closeable.close]] itself or arrange a
    * task-completion hook, as [[readAvro]] does — otherwise the reader
    * and underlying stream live until GC (ADVICE r13 #4).
    */
  def rowIterator(in: java.io.InputStream, dts: Array[DataType]): Iterator[Row] with java.io.Closeable = {
    val reader = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    new scala.collection.AbstractIterator[Row] with java.io.Closeable {
      private var closed = false
      override def close(): Unit = if (!closed) { closed = true; reader.close() }
      override def hasNext: Boolean = {
        if (closed) return false
        val h = reader.hasNext
        if (!h) close()
        h
      }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException("avro container exhausted")
        val rec = reader.next()
        Row.fromSeq(dts.indices.map(i => fromAvro(rec.get(i), dts(i))))
      }
    }
  }

  /** Source: schema from the first container header (driver-side, one
    * block read), then one task per file streaming records out lazily
    * via [[rowIterator]]. By default requires the sink's `_SUCCESS`
    * marker — a partial directory from a failed write job is refused,
    * not silently read as complete. Directories written before the
    * marker protocol existed, or by external avro tools (which write no
    * marker), opt out with `requireSuccessMarker = false`.
    */
  def readAvro(spark: SparkSession, path: String, requireSuccessMarker: Boolean = true): DataFrame = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!requireSuccessMarker || fs.exists(new Path(dir, "_SUCCESS")),
      s"$path has no _SUCCESS marker — refusing a partial/uncommitted avro directory " +
        "(readAvro(..., requireSuccessMarker = false) accepts externally-written trees)")
    val files = Option(fs.globStatus(new Path(s"$path/*.avro"))).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val headerStream = new DataFileStream[GenericRecord](fs.open(new Path(files.head)), new GenericDatumReader[GenericRecord]())
    val schema = try headerStream.getSchema finally headerStream.close()
    val st = structType(schema)
    val dts = st.fields.map(_.dataType)
    val rows = spark.read.format("binaryFile").load(s"$path/*.avro")
      .select("content").rdd
      .mapPartitions { partIt =>
        // a downstream limit/take can abandon an iterator mid-file: ONE
        // task-completion listener closes whatever is still open, and an
        // exhausted file de-registers so its bytes free immediately
        val tracker = graft.core.TaskCloseables.forTask()
        partIt.flatMap { r =>
          tracker.track(rowIterator(new ByteArrayInputStream(r.getAs[Array[Byte]](0)), dts))
        }
      }
    spark.createDataFrame(rows, st)
  }
}
