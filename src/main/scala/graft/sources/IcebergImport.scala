package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Read an Apache Iceberg table by parsing its metadata tree directly —
  * the Iceberg flavor of the interop story beside [[DeltaImport]]
  * (INTEROP.md documents the mapping; reference deploys on "Spark +
  * Delta/Iceberg over S3", BASELINE.md). No iceberg-spark jar needed:
  * table metadata is JSON, manifest lists and manifests are Avro — and the
  * core Avro library ships with Spark itself — so snapshot resolution is
  * (1) the newest `.metadata.json` under `metadata/`, (2) the chosen snapshot's
  * manifest-list Avro, (3) each manifest's data-file entries, (4) one
  * schema-pinned parquet scan over the live files.
  *
  * Scale notes: everything parsed on the driver is METADATA-sized —
  * manifest lists and manifests are bounded by file counts, the same tree
  * Iceberg's own planner walks; the data scan is a single distributed
  * parquet read. Identity-partitioned (and hidden-partitioned) Iceberg
  * data files retain their source columns in the file, so no
  * partition-column reconstruction is needed — the schema-pinned read is
  * complete as-is.
  *
  * Supported: format v1 and v2 metadata, snapshot time travel
  * (`snapshotAsOf` by snapshot id), `manifest-list` indirection and v1's
  * inline `manifests` array, DELETED manifest entries (excluded from the
  * live set), schema mapping for all Iceberg primitives plus
  * struct/list/map, v2 POSITION deletes (merge-on-read: the delete
  * files anti-join the data scan on (file_path, pos) via the scan's own
  * `_metadata` provenance columns — what real v2 tables contain after any
  * row-level operation), and v2 EQUALITY deletes (content=2, what Flink
  * CDC / upsert writers emit: each delete file names its key columns by
  * schema field id and deletes every matching row in data files with a
  * STRICTLY OLDER data sequence number — applied as a null-safe-equality
  * anti-join, sequence-scoped so a same-commit re-insert of the key
  * survives, partition-scoped when the delete manifest carries an
  * identity-partition tuple).
  *
  * Not supported, by explicit error rather than silent wrongness: equality
  * deletes whose `equality_ids` reference nested or unknown fields, and
  * non-parquet data files (ORC/Avro data would need different readers).
  */
object IcebergImport {

  /** `liveFiles` carries each data file's identity-partition tuple (empty
    * for unpartitioned tables / non-identity transforms) so callers — and
    * [[read]]'s `partitionFilter` — can prune FILES from the manifest
    * alone, before any parquet footer is opened. That is Iceberg's own
    * planning model: at 100 TB the difference between touching matching
    * files and touching all of them.
    */
  final case class TableState(
      snapshotId: Long,
      formatVersion: Int,
      schema: StructType,
      liveFiles: Seq[(String, Map[String, String])],
      /** identity-transform partition field names of the default spec —
        * the columns whose tuple values equal the source-column values
        * (declared in metadata, independent of which files carry values)
        */
      identityFields: Seq[String],
      /** every partition field of the default spec (identity AND hidden
        * transforms) — `partitionFilter` prunes on any whose transform
        * [[IcebergTransforms]] can replay
        */
      partitionFields: Seq[PartitionField] = Nil,
      /** v2 position-delete parquet files live at this snapshot (rows of
        * (file_path, pos) marking deleted rows — merge-on-read applies
        * them as an anti-join); empty for v1 / delete-free tables
        */
      positionDeleteFiles: Seq[String] = Nil,
      /** v2 equality-delete files live at this snapshot (content=2),
        * each with its key columns, data sequence number, and identity
        * partition scope; empty for v1 / Flink-CDC-free tables
        */
      equalityDeleteFiles: Seq[EqualityDeleteFile] = Nil,
      /** resolved data file path -> data sequence number (manifest-list
        * value, overridden by an explicit manifest-entry value) — the
        * scoping axis for equality deletes; metadata-sized
        */
      dataSequenceNumbers: Map[String, Long] = Map.empty
  )

  /** One v2 equality-delete parquet file: rows are key tuples over
    * `equalityColumns` (resolved from the spec's `equality_ids` field ids);
    * deletes every row whose data file has `sequenceNumber` strictly
    * greater than the data file's own, within `partitionScope` (empty =
    * global / unpartitioned spec).
    */
  final case class EqualityDeleteFile(
      path: String,
      equalityColumns: Seq[String],
      sequenceNumber: Long,
      partitionScope: Map[String, String] = Map.empty
  )

  /** One partition field of the default spec: the tuple field's `name`,
    * its `transform` (identity, day, bucket[N], ...), and the SOURCE
    * column it derives from (resolved from `source-id`).
    */
  final case class PartitionField(name: String, transform: String, source: String)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val f = fs(spark, path)
    val in = f.open(new Path(path))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  /** Driver-side Avro parse of a (metadata-sized) manifest / manifest-list
    * file, using the file's own writer schema — field access by name, so
    * spec-compliant files of any writer version work.
    */
  private def avroRows(spark: SparkSession, path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(readBytes(spark, path)),
      new GenericDatumReader[GenericRecord]()
    )
    try reader.iterator().asScala.toVector
    finally reader.close()
  }

  /** Newest `.metadata.json` under `metadata/` by embedded version number —
    * `vN.metadata.json` (HadoopTables layout) or `NNNNN-uuid.metadata.json`
    * (catalog layout); `version-hint.text` wins when present.
    */
  private def newestMetadataPath(spark: SparkSession, root: String): String = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/metadata")
    require(f.exists(dir), s"$root has no metadata/ directory — not an Iceberg table")
    val hint = new Path(dir, "version-hint.text")
    if (f.exists(hint)) {
      val v = new String(readBytes(spark, s"$root/metadata/version-hint.text"), "UTF-8").trim
      val p = new Path(dir, s"v$v.metadata.json")
      require(f.exists(p), s"version-hint points at v$v but ${p.getName} is missing")
      return p.toString
    }
    val cands = f.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith(".metadata.json"))
    require(cands.nonEmpty, s"$root/metadata contains no *.metadata.json")
    def versionOf(name: String): Long = {
      val stem = name.stripSuffix(".metadata.json")
      val digits = stem.stripPrefix("v").takeWhile(_.isDigit)
      if (digits.nonEmpty) digits.toLong else -1L
    }
    s"$root/metadata/${cands.maxBy(versionOf)}"
  }

  /** Map an Iceberg schema (its own JSON type system) to Spark's. */
  private[graft] def toSparkType(t: JsonNode): DataType =
    if (t.isTextual) {
      val s = t.asText()
      val Dec = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
      val Fixed = """fixed\[\s*(\d+)\s*\]""".r
      s match {
        case "boolean"                     => BooleanType
        case "int"                         => IntegerType
        case "long"                        => LongType
        case "float"                       => FloatType
        case "double"                      => DoubleType
        case "date"                        => DateType
        case "time"                        => LongType // micros since midnight; Spark has no TimeType
        // Iceberg `timestamp` is WITHOUT zone (parquet isAdjustedToUTC=false):
        // pin NTZ so wall-clock values don't get reinterpreted as instants
        case "timestamp"                   => TimestampNTZType
        case "timestamptz"                 => TimestampType
        case "string" | "uuid"             => StringType
        case "binary"                      => BinaryType
        case Dec(p, sc)                    => DecimalType(p.toInt, sc.toInt)
        case Fixed(_)                      => BinaryType
        case other => throw new IllegalArgumentException(s"unsupported Iceberg primitive type '$other'")
      }
    } else t.path("type").asText() match {
      case "struct" =>
        StructType(t.path("fields").elements().asScala.toSeq.map { fld =>
          StructField(fld.path("name").asText(), toSparkType(fld.path("type")), nullable = !fld.path("required").asBoolean(false))
        })
      case "list" =>
        ArrayType(toSparkType(t.path("element")), containsNull = !t.path("element-required").asBoolean(false))
      case "map" =>
        MapType(toSparkType(t.path("key")), toSparkType(t.path("value")), valueContainsNull = !t.path("value-required").asBoolean(false))
      case other => throw new IllegalArgumentException(s"unsupported Iceberg type '$other'")
    }

  /** Resolve a path from metadata: absolute URIs kept — including the
    * single-slash scheme form Hadoop renders for the local fs
    * (`file:/tmp/...`) — else joined to root (relative paths are not
    * spec-blessed, but tolerating them keeps old exports readable).
    */
  private def resolve(root: String, p: String): String =
    if (p.startsWith("/") || p.matches("[A-Za-z][A-Za-z0-9+.-]*:.*")) p else s"$root/$p"

  /** Resolve the snapshot (default: current) to its live parquet files.
    * `snapshotAsOf` addresses by snapshot id; `asOfTimestampMs` picks the
    * newest snapshot whose `timestamp-ms` is at-or-before the given epoch
    * millis (Iceberg's `TIMESTAMP AS OF` semantics) — id wins if both given.
    */
  def state(
      spark: SparkSession,
      root: String,
      snapshotAsOf: Option[Long] = None,
      asOfTimestampMs: Option[Long] = None
  ): TableState = {
    val mapper = new ObjectMapper()
    val meta = mapper.readTree(readBytes(spark, newestMetadataPath(spark, root)))
    val formatVersion = meta.path("format-version").asInt(1)
    require(formatVersion <= 2, s"format-version $formatVersion not supported (v1/v2 only)")

    // schema: v2 keeps a `schemas` list keyed by current-schema-id; v1 a
    // single `schema` object (also present in many v2 writers — prefer the
    // id-addressed form when it exists)
    val schemaNode =
      if (meta.has("schemas")) {
        val id = meta.path("current-schema-id").asInt(0)
        meta.path("schemas").elements().asScala.toSeq
          .find(_.path("schema-id").asInt(-1) == id)
          .getOrElse(throw new IllegalStateException(s"current-schema-id $id not in schemas"))
      } else meta.path("schema")
    val schema = toSparkType(schemaNode).asInstanceOf[StructType]

    val snapshots = meta.path("snapshots").elements().asScala.toVector
    require(snapshots.nonEmpty, s"$root has no snapshots — nothing to read")
    val byTimestamp: Option[Long] = asOfTimestampMs.map { ts =>
      val eligible = snapshots.filter(_.path("timestamp-ms").asLong(Long.MaxValue) <= ts)
      require(
        eligible.nonEmpty,
        s"no snapshot at or before timestamp $ts ms (oldest is " +
          s"${snapshots.map(_.path("timestamp-ms").asLong(Long.MaxValue)).min})"
      )
      // ties (same millisecond) break on sequence-number, matching commit order
      eligible
        .maxBy(s => (s.path("timestamp-ms").asLong(0), s.path("sequence-number").asLong(0)))
        .path("snapshot-id").asLong(-1L)
    }
    val snapId = snapshotAsOf.orElse(byTimestamp).getOrElse {
      val cur = meta.path("current-snapshot-id").asLong(-1L)
      require(cur >= 0, "metadata has no current-snapshot-id; pass snapshotAsOf")
      cur
    }
    val snap = snapshots
      .find(_.path("snapshot-id").asLong(-1L) == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapId not in table (have ${snapshots.map(_.path("snapshot-id").asLong(-1L)).mkString(",")})"))

    // top-level field id -> name, for resolving partition-spec source-ids
    // and equality_ids (both address schema columns by field id)
    val fieldIdToName: Map[Int, String] =
      schemaNode.path("fields").elements().asScala.toSeq.flatMap { fld =>
        val id = fld.path("id").asInt(-1)
        if (id >= 0) Some(id -> fld.path("name").asText()) else None
      }.toMap

    // every partition field of the default spec — identity fields' tuple
    // values equal the column values; hidden transforms (day, bucket[N],
    // truncate[W], ...) carry DERIVED values, which partitionFilter prunes
    // on by replaying the transform ([[IcebergTransforms]])
    def parseFields(fields: Iterator[JsonNode]): Seq[PartitionField] =
      fields.map { fld =>
        val name = fld.path("name").asText()
        PartitionField(
          name,
          fld.path("transform").asText(),
          fieldIdToName.getOrElse(fld.path("source-id").asInt(-1), name))
      }.toSeq
    val partitionFields: Seq[PartitionField] =
      if (meta.has("partition-specs")) {
        val specId = meta.path("default-spec-id").asInt(0)
        meta.path("partition-specs").elements().asScala
          .find(_.path("spec-id").asInt(-1) == specId)
          .map(s => parseFields(s.path("fields").elements().asScala))
          .getOrElse(Nil)
      } else if (meta.has("partition-spec")) {
        // legacy v1 metadata: a singular flat fields array
        parseFields(meta.path("partition-spec").elements().asScala)
      } else Nil
    val identityFields: Seq[String] =
      partitionFields.filter(_.transform == "identity").map(_.name)
    val allPartFieldNames: Seq[String] = partitionFields.map(_.name)

    // schema-probed optional-field access: GenericRecord.get(String) on a
    // missing field THROWS (AvroRuntimeException), it does not return null
    def probe(r: GenericRecord, f: String): Option[AnyRef] =
      if (r.getSchema.getField(f) == null) None else Option(r.get(f))
    def probeLong(r: GenericRecord, f: String): Option[Long] =
      probe(r, f).map(_.asInstanceOf[Number].longValue())

    // manifests of the snapshot: v2 (and modern v1) via the manifest-list
    // Avro; old v1 metadata may inline a `manifests` array instead.
    // Each carries its v2 `sequence_number` (0 for v1 — v1 has no
    // sequence numbers and no delete files, so 0 is never consulted).
    val manifests: Seq[(String, Int, Long)] =
      if (snap.has("manifest-list")) {
        avroRows(spark, resolve(root, snap.path("manifest-list").asText())).map { r =>
          val p = r.get("manifest_path").toString
          // `content` exists only from format v2 on — probe the writer
          // SCHEMA first (see `probe`); a genuine v1 manifest list lacks it
          val content = probeLong(r, "content").map(_.toInt).getOrElse(0)
          (p, content, probeLong(r, "sequence_number").getOrElse(0L))
        }
      } else if (snap.has("manifests")) {
        snap.path("manifests").elements().asScala.toSeq.map(p => (p.asText(), 0, 0L))
      } else throw new IllegalStateException(s"snapshot $snapId has neither manifest-list nor manifests")

    // manifest entries: status 0=EXISTING, 1=ADDED are live; 2=DELETED is
    // history only. A snapshot's manifest list is COMPLETE state (unlike
    // Delta's incremental log) — no cross-commit reconciliation needed.
    // Each entry's data sequence number is its explicit `sequence_number`
    // when present, else inherited from the manifest-list entry (the spec's
    // inheritance rule for ADDED entries; EXISTING entries written by
    // compliant writers always carry an explicit value).
    def liveEntries(mp: String): Seq[GenericRecord] =
      avroRows(spark, resolve(root, mp)).filter { entry =>
        Option(entry.get("status")).map(_.asInstanceOf[Number].intValue()).getOrElse(1) != 2
      }
    def entrySeq(entry: GenericRecord, manifestSeq: Long): Long =
      probeLong(entry, "sequence_number").getOrElse(manifestSeq)
    def partitionTuple(df: GenericRecord): Map[String, String] =
      probe(df, "partition").collect { case r: GenericRecord =>
        allPartFieldNames.flatMap { f =>
          if (r.getSchema.getField(f) == null) None
          else Option(r.get(f)).map(v => f -> String.valueOf(v))
        }.toMap
      }.getOrElse(Map.empty[String, String])

    val liveFiles = manifests.filter(_._2 == 0).flatMap { case (mp, _, mseq) =>
      liveEntries(mp).map { entry =>
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val fmt = df.get("file_format").toString.toUpperCase
        require(fmt == "PARQUET", s"data file format $fmt not supported (parquet only)")
        (df.get("file_path").toString, partitionTuple(df), entrySeq(entry, mseq))
      }
    }
    // Delete manifests (content=1) list v2 row-level delete files: POSITION
    // deletes (data_file.content=1, rows of (file_path, pos)) and EQUALITY
    // deletes (content=2, key tuples over the columns named by
    // `equality_ids`) — both collected for merge-on-read application.
    var posDeletes = Vector.empty[String]
    var eqDeletes = Vector.empty[EqualityDeleteFile]
    manifests.filter(_._2 == 1).foreach { case (mp, _, mseq) =>
      liveEntries(mp).foreach { entry =>
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val content = probeLong(df, "content").map(_.toInt).getOrElse(1)
        val fmt = df.get("file_format").toString.toUpperCase
        require(fmt == "PARQUET", s"delete file format $fmt not supported (parquet only)")
        val path = df.get("file_path").toString
        content match {
          case 1 => posDeletes :+= resolve(root, path)
          case 2 =>
            val ids = probe(df, "equality_ids") match {
              case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.asInstanceOf[Number].intValue())
              case _ => throw new IllegalArgumentException(
                s"equality delete file $path in $mp carries no equality_ids — cannot resolve its key columns")
            }
            require(ids.nonEmpty, s"equality delete file $path has an empty equality_ids list")
            val cols = ids.map { id =>
              fieldIdToName.getOrElse(id, throw new IllegalArgumentException(
                s"equality delete file $path references field id $id, which is not a " +
                  "top-level schema field — nested equality keys are not supported"))
            }
            eqDeletes :+= EqualityDeleteFile(
              resolve(root, path), cols, entrySeq(entry, mseq), partitionTuple(df))
          case other => throw new IllegalArgumentException(
            s"delete file $path in $mp has unknown content=$other (1=position, 2=equality)")
        }
      }
    }
    TableState(
      snapId, formatVersion, schema,
      liveFiles.map { case (p, pv, _) => resolve(root, p) -> pv },
      identityFields,
      partitionFields = partitionFields,
      positionDeleteFiles = posDeletes,
      equalityDeleteFiles = eqDeletes,
      dataSequenceNumbers = liveFiles.map { case (p, _, seq) => resolve(root, p) -> seq }.toMap
    )
  }

  /** The table's rows at the chosen snapshot (default: current).
    *
    * `partitionFilter` prunes at the MANIFEST level: keys are SOURCE
    * column names, values are source-column values, and only files whose
    * partition tuple matches every entry are opened — no parquet footer
    * is read for the rest. For identity fields the tuple value IS the
    * source value; for hidden transforms (`day(ts)`, `bucket[n](id)`,
    * `truncate[w](s)`, year/month/hour) the filter value is mapped
    * through [[IcebergTransforms]] to the derived value the tuple stores
    * — the same replay Iceberg's own planner performs, so hidden
    * partitioning prunes exactly like identity partitioning. Values
    * compare as strings against the manifest's typed partition struct
    * (`String.valueOf` on both sides). Columns that are no partition
    * field's source — or sit under a transform this module can't replay
    * — are rejected rather than silently scanning everything. A file
    * whose tuple LACKS a filtered field (written before a partition-spec
    * evolution) cannot be proven non-matching, so it is conservatively
    * SCANNED — pruning must never drop rows, only skip provably
    * irrelevant files. `partitionFilter` is therefore a FILE-pruning
    * hint, not a row predicate: compose it with the same `.filter` on the
    * returned frame (data files retain their source columns), exactly as
    * Iceberg's own planner pairs manifest pruning with the row filter.
    */
  def read(
      spark: SparkSession,
      root: String,
      snapshotAsOf: Option[Long] = None,
      partitionFilter: Map[String, String] = Map.empty,
      asOfTimestampMs: Option[Long] = None
  ): DataFrame = {
    val st = state(spark, root, snapshotAsOf, asOfTimestampMs)
    // validate against the spec's DECLARED partition fields, not observed
    // tuple keys: a legitimate partition source whose value is null in
    // every live file carries no tuple entry, yet filtering on it is valid
    // (null never equals the filter string, so those files stay in via the
    // missing-field conservative-scan rule below)
    val bySource: Map[String, Seq[PartitionField]] = st.partitionFields.groupBy(_.source)
    partitionFilter.keys.foreach { c =>
      val pfs = bySource.getOrElse(c, Nil)
      require(
        pfs.nonEmpty,
        s"partitionFilter column '$c' is not the source of any partition field of this table — " +
          "manifest-level pruning would silently scan everything"
      )
      pfs.foreach { pf =>
        require(
          IcebergTransforms.supported(pf.transform),
          s"partition transform '${pf.transform}' on '$c' cannot be replayed for pruning"
        )
      }
    }
    // forall over the OPTIONAL tuple value: a file missing the field
    // (pre-evolution) stays in — only a present-and-different value prunes
    val files = st.liveFiles.collect {
      case (p, pv) if partitionFilter.forall { case (c, v) =>
        bySource(c).forall { pf =>
          val derived = IcebergTransforms.derive(pf.transform, st.schema(c).dataType, v)
          pv.get(pf.name).forall(_ == derived)
        }
      } => p
    }
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    else {
      val data = spark.read.schema(st.schema).parquet(files: _*)
      if (st.positionDeleteFiles.isEmpty && st.equalityDeleteFiles.isEmpty) data
      else applyRowLevelDeletes(spark, data, st)
    }
  }

  /** Normalize a file path/URI to a scheme-free absolute form so the data
    * scan's `_metadata.file_path` (a qualified URI) and the delete files'
    * `file_path` strings (whatever form the writer recorded) compare equal:
    * `file:///tmp/x`, `file:/tmp/x` and `/tmp/x` all become `/tmp/x`
    * (`s3://bucket/k` -> `/bucket/k`, consistently on both sides).
    */
  private def canonPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")

  /** Driver-side twin of [[canonPath]] for manifest-recorded paths. */
  private def canonPathStr(p: String): String =
    p.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")

  /** MERGE-ON-READ for v2 row-level deletes, fully distributed.
    *
    * POSITION deletes (rows of (file_path, pos), spec field-ids
    * 2147483546/45) stream through a LEFT ANTI join against the data scan
    * keyed on the scan's own provenance columns (`_metadata.file_path`,
    * `_metadata.row_index`) — no driver-side delete materialization, and
    * at 100 TB the delete side is typically small enough that AQE
    * broadcasts it. Applying EVERY snapshot position delete to every live
    * file is exact: Iceberg data files are immutable and never re-added
    * under the same path, so a (path, pos) pair either hits the exact row
    * it was written against or nothing (the file was compacted away and
    * the delete is moot).
    *
    * EQUALITY deletes (content=2) anti-join on their key columns with
    * null-safe equality (`<=>` — the spec treats null as a matchable key
    * value), scoped two ways per spec: (1) by SEQUENCE — a delete applies
    * only to rows whose data file has a STRICTLY older data sequence
    * number, so the new rows a Flink upsert commits alongside its delete
    * survive; per-row sequence numbers come from a broadcast
    * (file -> seq) map that is manifest metadata, never data-sized;
    * (2) by PARTITION — a delete written under a partitioned spec applies
    * only within its identity-partition tuple (identity values equal the
    * column values, so the scope is a predicate on the data columns
    * themselves); an unpartitioned delete is global. Delete files sharing
    * a key-column set are unioned into ONE anti-join, so the plan grows
    * with the number of distinct key shapes (usually 1), not delete files.
    */
  private def applyRowLevelDeletes(spark: SparkSession, data: DataFrame, st: TableState): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val cols = st.schema.fieldNames.toIndexedSeq
    val needSeq = st.equalityDeleteFiles.nonEmpty
    val tagged = data
      .select((cols.map(col) :+
        canonPath(col("_metadata.file_path")).as("__graft_fp") :+
        col("_metadata.row_index").as("__graft_pos")): _*)

    val afterPos =
      if (st.positionDeleteFiles.isEmpty) tagged
      else {
        val dels = spark.read
          .parquet(st.positionDeleteFiles: _*)
          .select(canonPath(col("file_path")).as("__del_fp"), col("pos").cast("long").as("__del_pos"))
        tagged.join(
          dels,
          col("__graft_fp") === col("__del_fp") && col("__graft_pos") === col("__del_pos"),
          "left_anti")
      }

    val afterEq =
      if (!needSeq) afterPos
      else {
        // per-row data sequence number via file provenance; the map is
        // manifest-sized, broadcast explicitly
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val seqRows = st.dataSequenceNumbers.toSeq.map { case (p, s) =>
          Row(canonPathStr(p), s)
        }
        val seqDf = spark.createDataFrame(
          seqRows.asJava,
          StructType(Seq(StructField("__seq_fp", StringType), StructField("__data_seq", LongType))))
        val withSeq = afterPos.join(broadcast(seqDf), col("__graft_fp") === col("__seq_fp"), "left")
        st.equalityDeleteFiles.groupBy(_.equalityColumns).toSeq.sortBy(_._1.mkString(","))
          .foldLeft(withSeq) { case (acc, (eqCols, files)) =>
            val delDf = files.map { f =>
              val base = spark.read.parquet(f.path)
                .select(eqCols.map(c => col(c).as(s"__del_$c")): _*)
                .withColumn("__del_seq", lit(f.sequenceNumber))
              // partition scope as literal columns: null = unconstrained,
              // so heterogeneous scopes union into one delete relation
              st.identityFields.foldLeft(base) { (d, pf) =>
                d.withColumn(s"__scope_$pf", lit(f.partitionScope.get(pf).orNull))
              }
            }.reduce(_ unionByName _)
            val eqCond = eqCols.map(c => acc(c) <=> delDf(s"__del_$c")).reduce(_ && _)
            val seqCond = acc("__data_seq") < delDf("__del_seq")
            val scopeCond = st.identityFields
              .map(pf => delDf(s"__scope_$pf").isNull || acc(pf).cast("string") === delDf(s"__scope_$pf"))
              .foldLeft(lit(true))(_ && _)
            // no broadcast hint: accumulated CDC deletes can outgrow the
            // driver — the equi keys (eqCond) let AQE pick broadcast when
            // the delete side is actually small
            acc.join(delDf, eqCond && seqCond && scopeCond, "left_anti")
          }
      }
    afterEq.select(cols.map(col): _*)
  }
}
