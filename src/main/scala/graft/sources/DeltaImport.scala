package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Read a Delta Lake table by replaying its `_delta_log` JSON commits —
  * the import half of the interop story ([[DeltaExport]] is the export
  * half; INTEROP.md documents the mapping). No delta-spark jar needed:
  * the transaction log is newline-delimited JSON and the data files are
  * plain parquet, so log replay + a schema-pinned parquet scan is the
  * whole protocol (reference deploys on "Spark + Delta/Iceberg over S3",
  * BASELINE.md; great_expectations.py:337-338 saveAsTable).
  *
  * Supported: add/remove reconciliation, schema from the newest `metaData`
  * action at-or-before the target version, time travel (`versionAsOf`),
  * hive-style partitioned tables (partition columns reconstructed from
  * `partitionValues`), an append-only change feed ([[readChanges]]), and
  * checkpoint-compacted logs (old JSON vacuumed away: pre-history is
  * recovered from the newest `NNN.checkpoint.parquet` — single-part or a
  * complete multi-part `NNN.checkpoint.MMM.NNN.parquet` set, the layout
  * production writers emit for large tables — a checkpoint is reconciled
  * state, so it enters replay as a pseudo-commit of adds; time travel
  * BELOW the checkpoint errors as vacuumed).
  *
  * Column mapping: NAME mode is supported — the logical schema's field
  * metadata records each field's `delta.columnMapping.physicalName`, the
  * scan pins the physical schema the parquet files actually carry, and a
  * per-column struct cast renames everything (any nesting depth) back to
  * logical names; modern Delta writers enable name mode by default on new
  * tables, so refusing it would refuse most fresh tables. ID mode (tables
  * upgraded from early writer versions) is also supported: each field's
  * `delta.columnMapping.id` is stamped onto the pinned read schema as
  * `parquet.field.id` metadata and Spark's own parquet reader —
  * `spark.sql.parquet.fieldId.read.enabled` — resolves columns by the
  * field ids in each file's footer, PER FILE and fully distributed; no
  * driver-side footer reads, and heterogeneous physical names across
  * files (the reason id mode exists) resolve correctly.
  *
  * Deletion vectors (minReaderVersion 3, `deletionVectors` reader
  * feature) are supported merge-on-read: each live add's DV payload
  * ([[DeltaDv]] — u/i/p storage, framed + CRC-checked, Base85, portable
  * 64-bit roaring bitmap) expands to (file, row_index) pairs ON EXECUTORS
  * and anti-joins the scan's own `_metadata` provenance columns; the
  * driver holds only the compressed bitmap bytes (metadata-sized). DVs
  * compose with column mapping and time travel (the replayed add's DV at
  * that version wins; a rewritten file's DV-less re-add clears it).
  *
  * Not supported, by explicit error rather than silent wrongness: reader
  * features beyond deletionVectors/columnMapping, and id-mode fields
  * missing their `delta.columnMapping.id` (nothing to resolve by).
  *
  * Scale notes: the log is METADATA-sized — parsing it on the driver is
  * bounded by commit count × files per commit, the same order as Delta's
  * own snapshot reconstruction. The data scan is a single schema-pinned
  * reader over the live files when paths are hive-style-consistent with
  * their `partitionValues` (one scan node, partition columns recovered by
  * Spark's own discovery against `basePath`); only inconsistent writers
  * fall back to one scan per distinct partition tuple.
  */
object DeltaImport {

  /** Reconstructed snapshot: live files are (path relative to table root,
    * partitionValues) in first-added order. `schema` is the LOGICAL schema;
    * under `columnMappingMode = "name"` its fields carry
    * `delta.columnMapping.physicalName` metadata and the data files store
    * columns under those physical names.
    */
  final case class TableState(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      liveFiles: Seq[(String, Map[String, String])],
      columnMappingMode: String = "none",
      // relative data-file path -> its live deletion vector (adds without
      // a DV clear any previous one: an add action fully replaces the
      // path's metadata in the log replay)
      deletionVectors: Map[String, DvDescriptor] = Map.empty
  )

  /** One add action's `deletionVector` struct, verbatim from the log. */
  final case class DvDescriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Int,
      sizeInBytes: Int,
      cardinality: Long
  )

  private final case class Commit(
      version: Long,
      adds: Seq[(String, Map[String, String])],
      removes: Seq[String],
      schemaString: Option[String],
      partitionColumns: Option[Seq[String]],
      minReaderVersion: Option[Int],
      // Some(mode) iff this commit carries a metaData action: the mode is
      // configuration's delta.columnMapping.mode, defaulted to "none"
      columnMappingMode: Option[String],
      // adds carrying a deletionVector, keyed by path (subset of `adds`)
      dvs: Map[String, DvDescriptor] = Map.empty,
      // protocol readerFeatures (reader version 3+)
      readerFeatures: Option[Seq[String]] = None
  )

  private val CkptSingleRe = """(\d+)\.checkpoint\.parquet""".r
  private val CkptPartRe = """(\d+)\.checkpoint\.(\d+)\.(\d+)\.parquet""".r

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseLog(spark: SparkSession, root: String, upTo: Option[Long]): Seq[Commit] = {
    val f = fs(spark, root)
    val logDir = new Path(s"$root/_delta_log")
    require(f.exists(logDir), s"$root has no _delta_log — not a Delta table")
    val names = f.listStatus(logDir).toSeq.filter(_.isFile).map(_.getPath.getName)
    val versions = names
      .collect { case n if n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit) =>
        n.stripSuffix(".json").toLong
      }
      .sorted
    require(versions.nonEmpty, s"$root/_delta_log contains no commit JSON files")
    // A long-lived table checkpoints and vacuums old JSON: recover the
    // pre-history from the newest checkpoint parquet (single-part, or a
    // COMPLETE multi-part set) at or below the first surviving JSON, then
    // replay JSON from there.
    val singleCkpts = names.collect { case n @ CkptSingleRe(v) => v.toLong -> Seq(n) }.toMap
    val multiCkpts: Map[Long, Seq[String]] = names
      .collect { case n @ CkptPartRe(v, p, np) => (v.toLong, p.toInt, np.toInt, n) }
      // group by (version, declared part count): a stray part from an
      // abandoned attempt with a DIFFERENT count must not poison a
      // complete set at the same version
      .groupBy(e => (e._1, e._3))
      .flatMap { case ((v, np), parts) =>
        // usable only when every declared part is present exactly once
        if (parts.map(_._2).sorted == (1 to np)) Some((v, np) -> parts.sortBy(_._2).map(_._4))
        else None
      }
      // multiple complete sets for one version replay the same reconciled
      // state; pick deterministically (largest part count)
      .groupBy(_._1._1)
      .map { case (v, sets) => v -> sets.maxBy(_._1._2)._2 }
    val ckptFiles: Map[Long, Seq[String]] = singleCkpts ++ multiCkpts
    val target = upTo.getOrElse(versions.last)
    val ckpt: Option[Long] =
      if (versions.head == 0L) None
      else {
        val usable = ckptFiles.keys.filter(c => c + 1 >= versions.head)
        require(
          usable.nonEmpty,
          s"log starts at version ${versions.head}, not 0, and no usable " +
            s"checkpoint parquet (single-part or complete multi-part set) covers the gap " +
            s"(have: ${ckptFiles.keys.toSeq.sorted.mkString(",")})"
        )
        // replay = checkpoint state + JSON commits (ckpt, target]; any usable
        // checkpoint <= target works, the largest minimizes JSON replay. The
        // global newest would spuriously fail a versionAsOf that lands
        // BETWEEN two checkpoints even though the older one covers it.
        val le = usable.filter(_ <= target)
        require(
          le.nonEmpty,
          s"versionAsOf $target predates the oldest usable checkpoint at ${usable.min} — that history was vacuumed"
        )
        Some(le.max)
      }
    require(
      versions.contains(target) || ckpt.contains(target),
      s"versionAsOf $target not in log (have ${versions.head}..${versions.last})"
    )
    val mapper = new ObjectMapper()
    val ckptCommit: Option[Commit] = ckpt.map { cv =>
      // checkpoint parquet rows = one action each, same fields as the JSON
      // actions; state-sized, but parsed through a distributed scan with
      // only the action columns collected (bounded by live-file count).
      // Multi-part sets are one logical checkpoint: actions are disjointly
      // spread over the parts, so reading them as one scan reconciles fine.
      val cp = spark.read.parquet(ckptFiles(cv).map(n => s"$root/_delta_log/$n"): _*)
      val cols = cp.columns.toSet
      def metaField(name: String): Boolean =
        cols.contains("metaData") && cp.schema("metaData").dataType
          .asInstanceOf[StructType].fieldNames.contains(name)
      val addHasDv = cols.contains("add") && cp.schema("add").dataType
        .asInstanceOf[StructType].fieldNames.contains("deletionVector")
      val addRows =
        if (!cols.contains("add")) Nil
        else {
          val dvCols =
            if (addHasDv)
              Seq(
                col("add.deletionVector.storageType"),
                col("add.deletionVector.pathOrInlineDv"),
                col("add.deletionVector.offset"),
                col("add.deletionVector.sizeInBytes"),
                col("add.deletionVector.cardinality")
              )
            else Seq(lit(null).cast("string"), lit(null).cast("string"),
              lit(null).cast("int"), lit(null).cast("int"), lit(null).cast("long"))
          cp.filter(col("add").isNotNull)
            .select(col("add.path") +: col("add.partitionValues") +: dvCols: _*)
            .collect()
            .toSeq
        }
      val adds = addRows.map { r =>
        val pv = Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty[String, String])
        r.getString(0) -> pv
      }
      val ckptDvs = addRows.flatMap { r =>
        if (r.isNullAt(2)) None
        else
          Some(r.getString(0) -> DvDescriptor(
            storageType = r.getString(2),
            pathOrInlineDv = r.getString(3),
            // offset is required for on-disk (u/p) storage; defaulting a
            // missing one to 0 would later trip the frame-size require
            // with a misleading "DV size mismatch" — name the real problem
            offset =
              if (!r.isNullAt(4)) r.getInt(4)
              else if (r.getString(2) == "i") 0
              else throw new IllegalArgumentException(
                s"deletion vector for '${r.getString(0)}': missing offset for ${r.getString(2)}-storage DV (required for u/p storage)"),
            sizeInBytes = r.getInt(5),
            cardinality = r.getLong(6)
          ))
      }.toMap
      val meta =
        if (!cols.contains("metaData")) None
        else {
          val confCol =
            if (metaField("configuration")) col("metaData.configuration")
            else lit(null).cast("map<string,string>")
          cp.filter(col("metaData").isNotNull)
            .select(col("metaData.schemaString"), col("metaData.partitionColumns"), confCol)
            .collect()
            .headOption
        }
      val protoHasRf = cols.contains("protocol") && cp.schema("protocol").dataType
        .asInstanceOf[StructType].fieldNames.contains("readerFeatures")
      val proto =
        if (!cols.contains("protocol")) None
        else {
          val rfCol = if (protoHasRf) col("protocol.readerFeatures") else lit(null).cast("array<string>")
          cp.filter(col("protocol").isNotNull)
            .select(col("protocol.minReaderVersion"), rfCol)
            .collect()
            .headOption
        }
      Commit(
        version = cv,
        adds = adds,
        removes = Nil, // a checkpoint is reconciled state: no live removes
        schemaString = meta.map(_.getString(0)),
        partitionColumns = meta.map(_.getSeq[String](1)),
        minReaderVersion = proto.map(_.getInt(0)),
        columnMappingMode = meta.map { r =>
          Option(r.getMap[String, String](2))
            .flatMap(_.get("delta.columnMapping.mode"))
            .getOrElse("none")
        },
        dvs = ckptDvs,
        readerFeatures = proto.flatMap(r => if (r.isNullAt(1)) None else Some(r.getSeq[String](1)))
      )
    }
    val jsonCommits = versions
      .filter(v => v <= target && ckpt.forall(_ < v))
      .map { v =>
        val in = f.open(new Path(logDir, f"$v%020d.json"))
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toVector
          finally in.close()
        val nodes = lines.map(mapper.readTree)
        val meta = nodes.find(_.has("metaData")).map(_.path("metaData"))
        Commit(
          version = v,
          adds = nodes.filter(_.has("add")).map { n =>
            val a = n.path("add")
            val pv = a
              .path("partitionValues")
              .properties()
              .asScala
              .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
              .toMap
            a.path("path").asText() -> pv
          },
          removes = nodes.filter(_.has("remove")).map(_.path("remove").path("path").asText()),
          schemaString = meta.map(_.path("schemaString").asText()),
          partitionColumns = meta.map(_.path("partitionColumns").elements().asScala.map(_.asText()).toSeq),
          minReaderVersion =
            nodes.find(_.has("protocol")).map(_.path("protocol").path("minReaderVersion").asInt()),
          columnMappingMode = meta.map { m =>
            val mode = m.path("configuration").path("delta.columnMapping.mode")
            if (mode.isMissingNode || mode.isNull) "none" else mode.asText()
          },
          dvs = nodes
            .filter(n => n.has("add") && n.path("add").hasNonNull("deletionVector"))
            .map { n =>
              val a = n.path("add")
              val d = a.path("deletionVector")
              a.path("path").asText() -> DvDescriptor(
                storageType = d.path("storageType").asText(),
                pathOrInlineDv = d.path("pathOrInlineDv").asText(),
                offset = d.path("offset").asInt(0),
                sizeInBytes = d.path("sizeInBytes").asInt(),
                cardinality = d.path("cardinality").asLong()
              )
            }
            .toMap,
          readerFeatures = nodes.find(_.has("protocol")).flatMap { n =>
            val rf = n.path("protocol").path("readerFeatures")
            if (rf.isMissingNode || rf.isNull) None
            else Some(rf.elements().asScala.map(_.asText()).toSeq)
          }
        )
      }
    ckptCommit.toSeq ++ jsonCommits
  }

  /** Replay the log to the snapshot at `versionAsOf` (default: newest). */
  def state(spark: SparkSession, root: String, versionAsOf: Option[Long] = None): TableState =
    stateFrom(parseLog(spark, root, versionAsOf), root)

  /** Reconcile already-parsed commits into a snapshot — lets callers that
    * hold a parse (readChanges, tail) avoid re-walking the log.
    */
  /** Reader features this import actually implements. Protocol version 3
    * tables list the features a reader MUST understand; anything outside
    * this set is an explicit refusal, not silent wrongness.
    */
  private val SupportedReaderFeatures = Set("deletionVectors", "columnMapping")

  private def stateFrom(commits: Seq[Commit], root: String): TableState = {
    commits.flatMap(_.minReaderVersion).foreach { v =>
      require(v <= 3, s"minReaderVersion $v not supported (reader versions 1-3: plain, column mapping, deletion vectors)")
    }
    // version-3 tables enumerate required reader features — honor the
    // contract: read only what we can actually read
    commits.flatMap(_.readerFeatures).flatten.distinct.sorted.foreach { feat =>
      require(
        SupportedReaderFeatures.contains(feat),
        s"readerFeatures '$feat' not supported (supported: ${SupportedReaderFeatures.toSeq.sorted.mkString(", ")})"
      )
    }
    // Column mapping (minReaderVersion 2): data files carry physical
    // col-<uuid> parquet names. NAME mode reads pin the physical schema
    // and rename back; ID mode reads resolve by parquet field id through
    // Spark's own reader (readFiles). The newest metaData's configuration
    // is authoritative.
    val mappingMode = commits.flatMap(_.columnMappingMode).lastOption.getOrElse("none")
    require(
      Set("none", "name", "id").contains(mappingMode),
      s"delta.columnMapping.mode '$mappingMode' not supported (none/name/id)"
    )
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    val liveDv = scala.collection.mutable.HashMap.empty[String, DvDescriptor]
    commits.foreach { c =>
      // removes before adds: a path in both within one commit is a rewrite
      c.removes.foreach { p => live -= p; liveDv -= p }
      c.adds.foreach { case (p, pv) =>
        live(p) = pv
        // an add REPLACES the path's metadata wholesale: carrying a DV
        // installs it, carrying none clears any previous one (the file was
        // rewritten without its deleted rows)
        c.dvs.get(p) match {
          case Some(d) => liveDv(p) = d
          case None => liveDv -= p
        }
      }
    }
    val schemaString = commits.flatMap(_.schemaString).lastOption.getOrElse(
      throw new IllegalStateException(s"no metaData action in $root/_delta_log")
    )
    TableState(
      version = commits.last.version,
      schema = DataType.fromJson(schemaString).asInstanceOf[StructType],
      partitionColumns = commits.flatMap(_.partitionColumns).lastOption.getOrElse(Nil),
      liveFiles = live.toSeq,
      columnMappingMode = mappingMode,
      deletionVectors = liveDv.toMap
    )
  }

  private val PhysNameKey = "delta.columnMapping.physicalName"

  /** A field's parquet-side name: `physicalName` metadata under name-mode
    * mapping, else the logical name (upgraded tables record
    * physicalName = logical name for pre-existing columns; absent metadata
    * degrades to the same identity).
    */
  private def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey) else f.name

  /** Rename every struct field (at any nesting depth) to its physical name
    * — the schema the parquet files actually carry under name-mode mapping.
    */
  private def physicalize(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(name = physName(f), dataType = physicalize(f.dataType),
          metadata = org.apache.spark.sql.types.Metadata.empty)))
    case a: org.apache.spark.sql.types.ArrayType => a.copy(elementType = physicalize(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = physicalize(m.keyType), valueType = physicalize(m.valueType))
    case other => other
  }

  private val MapIdKey = "delta.columnMapping.id"
  private val ParquetFieldIdKey = "parquet.field.id"

  /** The read schema for ID-mode mapping: names are the physical names
    * (display only — resolution ignores them), and every struct field
    * carries `parquet.field.id` metadata copied from its
    * `delta.columnMapping.id`, which makes Spark's parquet reader match
    * columns by the ids stamped in each file's footer. A field without an
    * id is an explicit refusal — a name-based fallback would be the silent
    * wrongness id mode exists to prevent.
    */
  private def physicalizeIds(dt: DataType, at: String): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        require(
          f.metadata.contains(MapIdKey),
          s"id-mode column mapping: field '$at${f.name}' carries no $MapIdKey — nothing to resolve by"
        )
        f.copy(
          name = physName(f),
          dataType = physicalizeIds(f.dataType, s"$at${f.name}."),
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(ParquetFieldIdKey, f.metadata.getLong(MapIdKey)).build()
        )
      })
    case a: org.apache.spark.sql.types.ArrayType => a.copy(elementType = physicalizeIds(a.elementType, at))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = physicalizeIds(m.keyType, at), valueType = physicalizeIds(m.valueType, at))
    case other => other
  }

  /** The table's rows at `versionAsOf` (default newest), partition columns
    * reconstructed for partitioned tables.
    */
  def read(spark: SparkSession, root: String, versionAsOf: Option[Long] = None): DataFrame = {
    val st = state(spark, root, versionAsOf)
    readFiles(spark, root, st, st.liveFiles)
  }

  /** Append-only change feed: rows ADDED in versions (sinceVersion, upTo],
    * tagged with `_commit_version`. Removes are ignored by design — without
    * row-level deletion vectors a removed FILE means a rewrite, and
    * append-only ingestion (the streaming-tail use case) never removes.
    */
  def readChanges(
      spark: SparkSession,
      root: String,
      sinceVersion: Long,
      upTo: Option[Long] = None
  ): DataFrame = {
    val commits = parseLog(spark, root, upTo)
    val st = stateFrom(commits, root)
    val batches = commits.filter(_.version > sinceVersion).filter(_.adds.nonEmpty).map { c =>
      readFiles(spark, root, st, c.adds).withColumn("_commit_version", lit(c.version))
    }
    batches.reduceOption(_.unionByName(_)).getOrElse {
      val empty = spark.createDataFrame(
        new java.util.ArrayList[Row](),
        st.schema.add("_commit_version", "long")
      )
      empty
    }
  }

  /** Checkpointed incremental consumption of a Delta table's commits: every
    * version AFTER the durable offset at `checkpointLocation` is handed to
    * `onBatch` (rows added by that commit, one call per version, ascending),
    * and the offset advances only after the callback returns. Semantics are
    * therefore at-least-once per commit; pair with an idempotent sink (e.g.
    * [[graft.streaming.Streaming.scd2WarehouseSink]]'s `stream_batch`
    * marker, keyed here by the source version) for exactly-once end to end —
    * the same recipe the engine's own streaming loads use.
    *
    * This is the migration shadow-read: a Delta writer keeps committing,
    * the engine tails it commit-by-commit. Offset persistence is a
    * write-temp-then-rename of a one-line file via the Hadoop FS (atomic on
    * HDFS/local; on S3 the rename is copy+delete — still safe here because
    * re-processing a version is idempotent by contract).
    *
    * CHECKPOINT-COMPACTED LOGS (Delta writers checkpoint every 10 commits
    * and vacuum by default): when the next wanted version predates the
    * surviving history — first call against an already-compacted table, or
    * the writer checkpointed past a slow consumer's offset — the consumer
    * re-seeds instead of crashing: the first delivered batch is the
    * CHECKPOINT SNAPSHOT (the table's cumulative reconciled state, tagged
    * with the checkpoint version), and per-commit tailing resumes from the
    * version after it. Rows processed before the offset was overtaken are
    * re-delivered inside that snapshot — exactly the at-least-once contract
    * above, absorbed by the same idempotent sink.
    *
    * @return the new offset (newest processed version; -1 if log empty of
    *         new work and no offset existed)
    */
  def tail(
      spark: SparkSession,
      root: String,
      checkpointLocation: String,
      onBatch: (DataFrame, Long) => Unit
  ): Long = {
    val f = fs(spark, checkpointLocation)
    val offPath = new Path(s"$checkpointLocation/offset")
    val last: Long =
      if (f.exists(offPath)) {
        val in = f.open(offPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      } else -1L
    // ONE log parse (and at most one checkpoint-parquet scan) for the whole
    // call: each delivered version's batch is assembled from a prefix of
    // this parse. Re-calling readChanges per version would re-walk the log
    // AND re-scan the checkpoint parquet twice per commit — O(V^2) metadata
    // work on a long tail.
    val commits = parseLog(spark, root, None)
    val newest = commits.last.version
    // earliest replayable version: the checkpoint pseudo-commit (or first
    // surviving JSON). Below it history is vacuumed — re-seed from the
    // snapshot instead of crashing (see scaladoc).
    val floor = commits.head.version
    var processed = last
    (math.max(last + 1, floor) to newest).foreach { v =>
      val prefix = commits.filter(_.version <= v)
      val st = stateFrom(prefix, root) // guards + schema AS OF v, like upTo=Some(v)
      val batch = commits
        .find(c => c.version == v && c.adds.nonEmpty)
        .map(c => readFiles(spark, root, st, c.adds).withColumn("_commit_version", lit(v)))
        .getOrElse(
          spark.createDataFrame(
            new java.util.ArrayList[Row](),
            st.schema.add("_commit_version", "long")
          )
        )
      onBatch(batch.drop("_commit_version"), v)
      val tmp = new Path(s"$checkpointLocation/.offset.tmp")
      val out = f.create(tmp, true)
      out.write(v.toString.getBytes("UTF-8"))
      out.close()
      if (f.exists(offPath)) f.delete(offPath, false)
      if (!f.rename(tmp, offPath))
        throw new IllegalStateException(s"failed to persist tail offset $v at $checkpointLocation")
      processed = v
    }
    processed
  }

  private def readFiles(
      spark: SparkSession,
      root: String,
      st: TableState,
      files: Seq[(String, Map[String, String])]
  ): DataFrame = {
    val mapped = st.columnMappingMode != "none"
    // under column mapping the parquet files (and partition dirs /
    // partitionValues keys, per the Delta protocol) use PHYSICAL names:
    // read physically, project back to the logical schema at the end. A
    // struct cast renames nested fields by position, so one cast per
    // top-level column logicalizes any nesting depth. ID mode additionally
    // stamps parquet.field.id onto the read schema and flips Spark's
    // field-id reader on — a session conf, but inert for any scan whose
    // schema carries no field ids, so setting it is benign.
    if (st.columnMappingMode == "id")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val physSchemaAll = st.columnMappingMode match {
      case "id"   => physicalizeIds(st.schema, "").asInstanceOf[StructType]
      case "name" => physicalize(st.schema).asInstanceOf[StructType]
      case _      => st.schema
    }
    val physPartCols = st.partitionColumns.map(c => if (mapped) physName(st.schema(c)) else c)
    def toLogical(df: DataFrame): DataFrame =
      if (!mapped) df.select(st.schema.fieldNames.map(col).toIndexedSeq: _*)
      else df.select(st.schema.fields.map { f =>
        col(physName(f)).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    // partitionValues are physically keyed under mapping, logically
    // otherwise — tolerate both (upgraded tables' physical name IS the
    // logical name for pre-existing columns)
    def pvOf(pv: Map[String, String], logical: String, phys: String): Option[String] =
      pv.get(phys).orElse(pv.get(logical))

    val dataSchema = StructType(physSchemaAll.filterNot(f => physPartCols.contains(f.name)))
    if (files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    // deletion vectors of the files THIS read touches (readChanges passes
    // subsets): decoded lazily on executors, anti-joined on the scan's own
    // (_metadata.file_path, row_index) provenance — merge-on-read, no
    // driver-side position materialization
    val dvHere = files.flatMap { case (p, _) => st.deletionVectors.get(p).map(p -> _) }
    lazy val dvPos = dvPositions(spark, root, dvHere)
    def withoutDeleted(df: DataFrame): DataFrame =
      if (dvHere.isEmpty) df
      else {
        val keep = df.columns.toSeq
        df.withColumn("__graft_fp", canonPathCol(col("_metadata.file_path")))
          .withColumn("__graft_pos", col("_metadata.row_index"))
          .join(
            dvPos,
            col("__graft_fp") === col("__dv_fp") && col("__graft_pos") === col("__dv_pos"),
            "left_anti")
          .select(keep.map(col): _*)
      }
    val paths = files.map { case (p, _) => s"$root/$p" }
    if (st.partitionColumns.isEmpty)
      return toLogical(withoutDeleted(spark.read.schema(dataSchema).parquet(paths: _*)))
    // Fast path: compliant writers put files under hive-style partition
    // dirs matching partitionValues — one scan node, Spark's own partition
    // discovery against basePath recovers the columns (and prunes on them).
    val hiveConsistent = files.forall { case (p, pv) =>
      st.partitionColumns.zip(physPartCols).forall { case (c, pc) =>
        pvOf(pv, c, pc).forall(v => v == null || p.contains(s"$pc=$v"))
      }
    }
    if (hiveConsistent) {
      toLogical(
        withoutDeleted(
          spark.read
            .option("basePath", root)
            .schema(physSchemaAll)
            .parquet(paths: _*)
        )
      )
    } else {
      // Fallback: one scan per distinct partition tuple, values from the
      // authoritative partitionValues map. Group count = touched partition
      // tuples (metadata-scale). DV filtering applies to each group's raw
      // scan (where _metadata is still resolvable), before partition
      // columns are attached.
      files
        .groupBy(_._2)
        .toSeq
        .sortBy(_._1.toSeq.sorted.mkString("\u0000"))
        .map { case (pv, fl) =>
          var df = withoutDeleted(
            spark.read.schema(dataSchema).parquet(fl.map { case (p, _) => s"$root/$p" }: _*))
          st.partitionColumns.zip(physPartCols).foreach { case (c, pc) =>
            df = df.withColumn(pc, lit(pvOf(pv, c, pc).orNull).cast(st.schema(c).dataType))
          }
          toLogical(df)
        }
        .reduce(_.unionByName(_))
    }
  }

  /** Same scheme-stripping canonicalization as the Iceberg position-delete
    * join: `file:///x`, `file:/x` and `/x` all compare equal.
    */
  private def canonPathCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")
  private def canonPathStr(s: String): String =
    s.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")

  /** Deleted (file, row-index) pairs of the touched files, as a DataFrame.
    * The driver fetches only the DV PAYLOADS (compressed bitmaps —
    * metadata-sized, the same order as the log referencing them); the
    * positions they expand to are enumerated lazily on executors, so a
    * million-row DV never materializes driver-side.
    */
  private def dvPositions(
      spark: SparkSession,
      root: String,
      dvs: Seq[(String, DvDescriptor)]
  ): DataFrame = {
    val f = fs(spark, root)
    val absRoot = f.makeQualified(new Path(root)).toString
    def readAll(p: Path): Array[Byte] = {
      val pf = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val len = pf.getFileStatus(p).getLen
      require(len <= Int.MaxValue, s"DV file $p too large")
      val buf = new Array[Byte](len.toInt)
      val in = pf.open(p)
      try in.readFully(0, buf)
      finally in.close()
      buf
    }
    val payloads: Seq[(String, Array[Byte])] = dvs.map { case (rel, d) =>
      val payload = d.storageType match {
        case "i" => DeltaDv.base85Decode(d.pathOrInlineDv)
        case "u" => DeltaDv.unframe(
          readAll(new Path(s"$absRoot/${DeltaDv.dvFileRelPath(d.pathOrInlineDv)}")), d.offset, d.sizeInBytes)
        case "p" => DeltaDv.unframe(readAll(new Path(d.pathOrInlineDv)), d.offset, d.sizeInBytes)
        case other =>
          throw new IllegalArgumentException(s"deletionVector storageType '$other' not supported (u, i, p)")
      }
      canonPathStr(s"$absRoot/$rel") -> payload
    }
    import spark.implicits._
    spark
      .createDataset(payloads)
      .flatMap { case (fp, bytes) => DeltaDv.decodePortable(bytes).map(pos => (fp, pos)) }
      .toDF("__dv_fp", "__dv_pos")
  }
}
