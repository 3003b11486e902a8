package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IcebergImport

/** Iceberg import: the fixture synthesizes a spec-compliant table by hand —
  * real parquet data files, real Avro manifest lists and manifests (written
  * with the same Avro library Spark ships), real metadata JSON — because no
  * Iceberg writer exists in this sandbox. Field names follow the Iceberg
  * spec exactly (manifest_path/content; status/data_file.file_path/...), so
  * a real writer's files are a superset of what the reader navigates.
  */
class IcebergImportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"content","type":"int"}]}""".stripMargin)

  private def writeAvro(path: String, schema: Schema, rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append)
    finally w.close()
  }

  private def manifestEntry(status: Int, filePath: String, n: Long): GenericRecord = {
    val df = new GenericData.Record(manifestSchema.getField("data_file").schema())
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", n)
    val e = new GenericData.Record(manifestSchema)
    e.put("status", status)
    e.put("data_file", df)
    e
  }

  private def manifestListRow(path: String, content: Int): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path)
    r.put("manifest_length", new java.io.File(path).length())
    r.put("content", content)
    r
  }

  private def writeDataFile(root: String, name: String, rows: Seq[(Int, String)]): String = {
    val dest = s"$root/data/$name"
    TableFixtures.writeSinglePartParquet(rows.toDF("x", "p"), dest)
    dest
  }

  private val icebergSchemaJson =
    """{"type":"struct","schema-id":0,"fields":[
      |  {"id":1,"name":"x","required":true,"type":"int"},
      |  {"id":2,"name":"p","required":false,"type":"string"}]}""".stripMargin

  private def metadataJson(
      snapshots: Seq[(Long, String)],
      current: Long,
      partitionSpecs: String = """[{"spec-id":0,"fields":[]}]""",
      formatVersion: Int = 2
  ): String = {
    val snaps = snapshots.map { case (id, ml) =>
      s"""{"snapshot-id":$id,"timestamp-ms":0,"manifest-list":${graft.core.Json.str(ml)}}"""
    }.mkString("[", ",", "]")
    s"""{"format-version":$formatVersion,"table-uuid":"t","location":"","last-sequence-number":1,
       |"last-updated-ms":0,"last-column-id":2,
       |"schemas":[$icebergSchemaJson],"current-schema-id":0,
       |"partition-specs":$partitionSpecs,"default-spec-id":0,
       |"current-snapshot-id":$current,"snapshots":$snaps}""".stripMargin
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
    df.select(col("x"), col("p")).collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("v2 snapshot read, time travel by snapshot id, DELETED entries excluded") {
    val root = Files.createTempDirectory("graft-ice").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val f1 = writeDataFile(root, "f1.parquet", Seq((1, "a"), (2, "a")))
    val f2 = writeDataFile(root, "f2.parquet", Seq((3, "b")))
    val f3 = writeDataFile(root, "f3.parquet", Seq((4, "c")))

    // snapshot 100: f1 + f2 live
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, f1, 2), manifestEntry(1, f2, 1)))
    val ml1 = s"$root/metadata/snap-100.avro"
    writeAvro(ml1, manifestListSchema, Seq(manifestListRow(m1, 0)))

    // snapshot 200: f2 DELETED (compacted away), f3 added — f1 carried
    val m2 = s"$root/metadata/m2.avro"
    writeAvro(m2, manifestSchema,
      Seq(manifestEntry(0, f1, 2), manifestEntry(2, f2, 1), manifestEntry(1, f3, 1)))
    val ml2 = s"$root/metadata/snap-200.avro"
    writeAvro(ml2, manifestListSchema, Seq(manifestListRow(m2, 0)))

    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((100L, ml1)), 100L))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v2.metadata.json"),
      metadataJson(Seq((100L, ml1), (200L, ml2)), 200L))

    // newest metadata wins; current snapshot = 200 (f2's DELETED entry gone)
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (2, "a"), (4, "c")))
    assert(IcebergImport.read(spark, root).schema.fieldNames.toSeq == Seq("x", "p"))
    // time travel to snapshot 100
    assert(rows(IcebergImport.read(spark, root, snapshotAsOf = Some(100L))) ==
      Set((1, "a"), (2, "a"), (3, "b")))
    val st = IcebergImport.state(spark, root)
    assert(st.snapshotId == 200L && st.formatVersion == 2 && st.liveFiles.size == 2)
    // unknown snapshot: explicit error
    val e = intercept[IllegalArgumentException](IcebergImport.read(spark, root, snapshotAsOf = Some(9L)))
    assert(e.getMessage.contains("snapshot"))
  }

  // delete-manifest entries: data_file carries the v2 `content`
  // discriminator (1 = position deletes, 2 = equality deletes)
  private val deleteManifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"data_file","type":{"type":"record","name":"delete_file","fields":[
      |    {"name":"content","type":"int"},
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)

  private def deleteEntry(content: Int, filePath: String, n: Long): GenericRecord = {
    val df = new GenericData.Record(deleteManifestSchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", n)
    val e = new GenericData.Record(deleteManifestSchema)
    e.put("status", 1)
    e.put("data_file", df)
    e
  }

  test("v2 position deletes apply as merge-on-read: deleted rows vanish, counts match") {
    val root = Files.createTempDirectory("graft-ice-del").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val f1 = writeDataFile(root, "f1.parquet", Seq((1, "a"), (2, "a"), (3, "b")))
    val f2 = writeDataFile(root, "f2.parquet", Seq((4, "c")))
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, f1, 3), manifestEntry(1, f2, 1)))
    // position-delete parquet: (file_path, pos) — row 1 of f1 (the (2,a)
    // row, 0-based) and row 0 of f2
    val delData = s"$root/data/del-0.parquet"
    TableFixtures.writeSinglePartParquet(
      Seq((f1, 1L), (f2, 0L)).toDF("file_path", "pos"), delData)
    val md = s"$root/metadata/md.avro"
    writeAvro(md, deleteManifestSchema, Seq(deleteEntry(1, delData, 2)))
    val ml = s"$root/metadata/snap-1.avro"
    writeAvro(ml, manifestListSchema, Seq(manifestListRow(m1, 0), manifestListRow(md, 1)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((1L, ml)), 1L))

    val st = IcebergImport.state(spark, root)
    assert(st.positionDeleteFiles.size == 1)
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (3, "b")))
    assert(IcebergImport.read(spark, root).count() == 2)
    // a delete entry with DELETED status (compacted away) no longer applies
    val mdGone = s"$root/metadata/md2.avro"
    writeAvro(mdGone, deleteManifestSchema, Seq(deleteEntry(1, delData, 2)))
    val ml2 = s"$root/metadata/snap-2.avro"
    val entGone = {
      val e = deleteEntry(1, delData, 2); e.put("status", 2); e
    }
    writeAvro(mdGone, deleteManifestSchema, Seq(entGone))
    writeAvro(ml2, manifestListSchema, Seq(manifestListRow(m1, 0), manifestListRow(mdGone, 1)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v2.metadata.json"),
      metadataJson(Seq((1L, ml), (2L, ml2)), 2L))
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (2, "a"), (3, "b"), (4, "c")))
  }

  test("equality delete without equality_ids, or referencing an unknown field id, is refused") {
    val root = Files.createTempDirectory("graft-ice-eqdel").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val f1 = writeDataFile(root, "f1.parquet", Seq((1, "a")))
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, f1, 1)))
    // no equality_ids field in the writer schema at all -> unresolvable keys
    val md = s"$root/metadata/md.avro"
    writeAvro(md, deleteManifestSchema, Seq(deleteEntry(2, s"$root/data/eq.parquet", 1)))
    val ml = s"$root/metadata/snap-1.avro"
    writeAvro(ml, manifestListSchema, Seq(manifestListRow(m1, 0), manifestListRow(md, 1)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((1L, ml)), 1L))
    val e = intercept[IllegalArgumentException](IcebergImport.read(spark, root))
    assert(e.getMessage.contains("equality_ids"))
    // equality_ids naming a field id the schema doesn't declare -> refused
    val md2 = s"$root/metadata/md2.avro"
    writeAvro(md2, eqDeleteManifestSchema,
      Seq(eqDeleteEntry(s"$root/data/eq.parquet", Seq(99))))
    val ml2 = s"$root/metadata/snap-2.avro"
    writeAvro(ml2, manifestListSchema, Seq(manifestListRow(m1, 0), manifestListRow(md2, 1)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v2.metadata.json"),
      metadataJson(Seq((1L, ml), (2L, ml2)), 2L))
    val e2 = intercept[IllegalArgumentException](IcebergImport.read(spark, root))
    assert(e2.getMessage.contains("field id 99"))
  }

  // equality-delete fixtures: manifest list rows carrying v2
  // sequence_number, delete entries carrying equality_ids
  private val seqManifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"content","type":"int"},
      |  {"name":"sequence_number","type":"long"}]}""".stripMargin)

  private def seqManifestListRow(path: String, content: Int, seq: Long): GenericRecord = {
    val r = new GenericData.Record(seqManifestListSchema)
    r.put("manifest_path", path)
    r.put("manifest_length", new java.io.File(path).length())
    r.put("content", content)
    r.put("sequence_number", seq)
    r
  }

  private val eqDeleteManifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"data_file","type":{"type":"record","name":"delete_file","fields":[
      |    {"name":"content","type":"int"},
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"record_count","type":"long"},
      |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)

  private def eqDeleteEntry(filePath: String, ids: Seq[Int]): GenericRecord = {
    val df = new GenericData.Record(eqDeleteManifestSchema.getField("data_file").schema())
    df.put("content", 2)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", ids.size.toLong)
    df.put("equality_ids", ids.map(Int.box).asJava)
    val e = new GenericData.Record(eqDeleteManifestSchema)
    e.put("status", 1)
    e.put("data_file", df)
    e
  }

  test("equality deletes: key rows vanish; strictly-older sequence scoping spares same-commit re-inserts") {
    val root = Files.createTempDirectory("graft-ice-eq").toString
    new java.io.File(s"$root/metadata").mkdirs()
    // commit 1 (seq 1): f1. commit 2 (seq 2): equality delete on x in
    // {2,3} PLUS a re-insert of key 2 — the Flink upsert shape. The delete
    // must erase seq-1 rows with x=2/x=3 and spare the seq-2 (2,"b").
    val f1 = writeDataFile(root, "f1.parquet", Seq((1, "a"), (2, "a"), (3, "b")))
    val f2 = writeDataFile(root, "f2.parquet", Seq((2, "b")))
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, f1, 3)))
    val m2 = s"$root/metadata/m2.avro"
    writeAvro(m2, manifestSchema, Seq(manifestEntry(1, f2, 1)))
    val eqData = s"$root/data/eq-del.parquet"
    TableFixtures.writeSinglePartParquet(Seq(2, 3).toDF("x"), eqData)
    val md = s"$root/metadata/md.avro"
    writeAvro(md, eqDeleteManifestSchema, Seq(eqDeleteEntry(eqData, Seq(1))))
    val ml = s"$root/metadata/snap-2.avro"
    writeAvro(ml, seqManifestListSchema, Seq(
      seqManifestListRow(m1, 0, 1L), seqManifestListRow(m2, 0, 2L), seqManifestListRow(md, 1, 2L)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((2L, ml)), 2L))

    val st = IcebergImport.state(spark, root)
    assert(st.equalityDeleteFiles.map(d => (d.equalityColumns, d.sequenceNumber)) == Seq((Seq("x"), 2L)))
    assert(st.dataSequenceNumbers.values.toSet == Set(1L, 2L))
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (2, "b")))
  }

  test("partition-scoped equality delete applies only within its identity-partition tuple") {
    val root = Files.createTempDirectory("graft-ice-eqpart").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val fa = writeDataFile(root, "fa.parquet", Seq((1, "a"), (2, "a")))
    val fb = writeDataFile(root, "fb.parquet", Seq((2, "b")))
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, fa, 2), manifestEntry(1, fb, 1)))
    // delete x=2 scoped to partition p="a": the (2,"b") row must survive
    val partEqSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"delete_file","fields":[
        |    {"name":"content","type":"int"},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |      {"name":"p","type":["null","string"],"default":null}]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)
    val eqData = s"$root/data/eq-del.parquet"
    TableFixtures.writeSinglePartParquet(Seq(2).toDF("x"), eqData)
    val delEntry = {
      val part = new GenericData.Record(
        partEqSchema.getField("data_file").schema().getField("partition").schema())
      part.put("p", "a")
      val df = new GenericData.Record(partEqSchema.getField("data_file").schema())
      df.put("content", 2); df.put("file_path", eqData); df.put("file_format", "PARQUET")
      df.put("partition", part); df.put("record_count", 1L)
      df.put("equality_ids", Seq(Int.box(1)).asJava)
      val e = new GenericData.Record(partEqSchema)
      e.put("status", 1); e.put("data_file", df)
      e
    }
    val md = s"$root/metadata/md.avro"
    writeAvro(md, partEqSchema, Seq(delEntry))
    val ml = s"$root/metadata/snap-2.avro"
    writeAvro(ml, seqManifestListSchema, Seq(
      seqManifestListRow(m1, 0, 1L), seqManifestListRow(md, 1, 2L)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((2L, ml)), 2L,
        """[{"spec-id":0,"fields":[{"name":"p","transform":"identity","source-id":2,"field-id":1000}]}]"""))

    val st = IcebergImport.state(spark, root)
    assert(st.equalityDeleteFiles.head.partitionScope == Map("p" -> "a"))
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (2, "b")))
  }

  test("genuine v1 manifest-list (no content field) imports — schema-probed, not crashed") {
    // format v1 predates the manifest-list `content` field; avro's
    // GenericRecord.get(String) THROWS on a missing field, so the reader
    // must probe the writer schema before touching it
    val root = Files.createTempDirectory("graft-ice-v1").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val f1 = writeDataFile(root, "f1.parquet", Seq((1, "a"), (2, "b")))
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, f1, 2)))
    val v1ListSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"}]}""".stripMargin)
    val row = new GenericData.Record(v1ListSchema)
    row.put("manifest_path", m1)
    row.put("manifest_length", new java.io.File(m1).length())
    val ml = s"$root/metadata/snap-1.avro"
    writeAvro(ml, v1ListSchema, Seq(row))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((1L, ml)), 1L, formatVersion = 1))
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (2, "b")))
    assert(IcebergImport.state(spark, root).formatVersion == 1)
  }

  test("version-hint.text pins the metadata version") {
    val root = Files.createTempDirectory("graft-ice-hint").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val f1 = writeDataFile(root, "f1.parquet", Seq((7, "z")))
    val m1 = s"$root/metadata/m1.avro"
    writeAvro(m1, manifestSchema, Seq(manifestEntry(1, f1, 1)))
    val ml = s"$root/metadata/snap-5.avro"
    writeAvro(ml, manifestListSchema, Seq(manifestListRow(m1, 0)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v3.metadata.json"),
      metadataJson(Seq((5L, ml)), 5L))
    // a PARSEABLE newer-looking metadata pointing at DIFFERENT rows: a
    // reader that ignores the hint (with or without a parse-failure
    // fallback) would resolve v4 and return (8,"w") — only genuine
    // hint-pinning yields v3's rows
    val f2 = writeDataFile(root, "f2.parquet", Seq((8, "w")))
    val m2 = s"$root/metadata/m2.avro"
    writeAvro(m2, manifestSchema, Seq(manifestEntry(1, f2, 1)))
    val ml2 = s"$root/metadata/snap-6.avro"
    writeAvro(ml2, manifestListSchema, Seq(manifestListRow(m2, 0)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v4.metadata.json"),
      metadataJson(Seq((6L, ml2)), 6L))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/version-hint.text"), "3")
    assert(rows(IcebergImport.read(spark, root)) == Set((7, "z")))
  }

  test("identity-partitioned table: manifest-level file pruning, no parquet opened off-partition") {
    val root = Files.createTempDirectory("graft-ice-part").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val fa = writeDataFile(root, "fa.parquet", Seq((1, "a"), (2, "a")))
    val fb = writeDataFile(root, "fb.parquet", Seq((3, "b")))

    // manifest whose data_file carries the spec's partition struct
    val pSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |      {"name":"p","type":"string"}]}},
        |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)
    def entry(path: String, p: String, n: Long): GenericRecord = {
      val part = new GenericData.Record(
        pSchema.getField("data_file").schema().getField("partition").schema())
      part.put("p", p)
      val df = new GenericData.Record(pSchema.getField("data_file").schema())
      df.put("file_path", path); df.put("file_format", "PARQUET")
      df.put("partition", part); df.put("record_count", n)
      val e = new GenericData.Record(pSchema)
      e.put("status", 1); e.put("data_file", df)
      e
    }
    val m = s"$root/metadata/m1.avro"
    writeAvro(m, pSchema, Seq(entry(fa, "a", 2), entry(fb, "b", 1)))
    val ml = s"$root/metadata/snap-1.avro"
    writeAvro(ml, manifestListSchema, Seq(manifestListRow(m, 0)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((1L, ml)), 1L,
        """[{"spec-id":0,"fields":[{"name":"p","transform":"identity","source-id":2,"field-id":1000}]}]"""))

    // unfiltered: both files
    assert(rows(IcebergImport.read(spark, root)) == Set((1, "a"), (2, "a"), (3, "b")))
    // filtered: only partition a's rows, and only its FILE is opened
    val pruned = IcebergImport.read(spark, root, partitionFilter = Map("p" -> "a"))
    assert(rows(pruned) == Set((1, "a"), (2, "a")))
    assert(pruned.inputFiles.length == 1, "manifest pruning must skip the off-partition file")
    // the state itself carries the tuples (file-level pruning is manifest-only)
    assert(IcebergImport.state(spark, root).liveFiles.toMap.values.toSet ==
      Set(Map("p" -> "a"), Map("p" -> "b")))
    // a filter on a non-partition column is refused, not silently unpruned
    val e = intercept[IllegalArgumentException](
      IcebergImport.read(spark, root, partitionFilter = Map("x" -> "1")))
    assert(e.getMessage.contains("partition field"))

    // partition-spec evolution: a file written BEFORE the spec gained p has
    // no p in its tuple — it cannot be proven non-matching, so pruning must
    // conservatively SCAN it rather than silently drop its rows
    val fOld = writeDataFile(root, "fold.parquet", Seq((9, "a")))
    val mOld = s"$root/metadata/m2.avro"
    writeAvro(mOld, manifestSchema, Seq(manifestEntry(1, fOld, 1))) // tuple-less schema
    val ml2 = s"$root/metadata/snap-2.avro"
    writeAvro(ml2, manifestListSchema, Seq(manifestListRow(m, 0), manifestListRow(mOld, 0)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v2.metadata.json"),
      metadataJson(Seq((1L, ml), (2L, ml2)), 2L,
        """[{"spec-id":0,"fields":[{"name":"p","transform":"identity","source-id":2,"field-id":1000}]}]"""))
    val evolved = IcebergImport.read(spark, root, partitionFilter = Map("p" -> "a"))
    assert(evolved.inputFiles.length == 2, "the pre-evolution file must be scanned, not pruned")
    // the filter is a pruning hint: compose the row predicate for exactness
    assert(rows(evolved.filter(col("p") === "a")) == Set((1, "a"), (2, "a"), (9, "a")))
  }

  test("identity column null in every live file: filter accepted (declared-field validation), conservative scan") {
    val root = Files.createTempDirectory("graft-ice-nullpart").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val fa = writeDataFile(root, "fa.parquet", Seq((1, "a")))
    val fb = writeDataFile(root, "fb.parquet", Seq((2, "b")))
    // nullable partition field, null in EVERY file: the tuple carries no
    // entry for p, so validating against observed tuples would reject a
    // legitimate declared identity column
    val pSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |      {"name":"p","type":["null","string"],"default":null}]}},
        |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)
    def entry(path: String, n: Long): GenericRecord = {
      val part = new GenericData.Record(
        pSchema.getField("data_file").schema().getField("partition").schema())
      val df = new GenericData.Record(pSchema.getField("data_file").schema())
      df.put("file_path", path); df.put("file_format", "PARQUET")
      df.put("partition", part); df.put("record_count", n)
      val e = new GenericData.Record(pSchema)
      e.put("status", 1); e.put("data_file", df)
      e
    }
    val m = s"$root/metadata/m1.avro"
    writeAvro(m, pSchema, Seq(entry(fa, 1), entry(fb, 1)))
    val ml = s"$root/metadata/snap-1.avro"
    writeAvro(ml, manifestListSchema, Seq(manifestListRow(m, 0)))
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      metadataJson(Seq((1L, ml)), 1L,
        """[{"spec-id":0,"fields":[{"name":"p","transform":"identity","source-id":2,"field-id":1000}]}]"""))
    assert(IcebergImport.state(spark, root).identityFields == Seq("p"))
    // null never equals the filter value, but a null-tuple file cannot be
    // proven non-matching -> conservative scan of both files, no rejection
    val pruned = IcebergImport.read(spark, root, partitionFilter = Map("p" -> "a"))
    assert(pruned.inputFiles.length == 2)
    assert(rows(pruned) == Set((1, "a"), (2, "b")))
  }

  test("hidden partitioning: days(ts) filter prunes to exact file counts via transform replay") {
    val root = Files.createTempDirectory("graft-ice-days").toString
    new java.io.File(s"$root/metadata").mkdirs()
    val d1 = java.time.LocalDate.ofEpochDay(19000L) // 2022-01-08
    val d2 = java.time.LocalDate.ofEpochDay(19005L)
    def dataFile(name: String, rows: Seq[(Int, java.time.LocalDate)]): String = {
      val dest = s"$root/data/$name"
      TableFixtures.writeSinglePartParquet(
        rows.map { case (x, d) => (x, java.sql.Date.valueOf(d)) }.toDF("x", "ts"), dest)
      dest
    }
    val f1 = dataFile("f1.parquet", Seq((1, d1), (2, d1)))
    val f2 = dataFile("f2.parquet", Seq((3, d2)))
    // manifest tuples carry the DERIVED day ints — hand-placed literals,
    // exactly what a real writer stores under days(ts)
    val pSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[
        |      {"name":"ts_day","type":["null","int"],"default":null}]}},
        |    {"name":"record_count","type":"long"}]}}]}""".stripMargin)
    def entry(path: String, day: Int, n: Long): GenericRecord = {
      val part = new GenericData.Record(
        pSchema.getField("data_file").schema().getField("partition").schema())
      part.put("ts_day", day)
      val df = new GenericData.Record(pSchema.getField("data_file").schema())
      df.put("file_path", path); df.put("file_format", "PARQUET")
      df.put("partition", part); df.put("record_count", n)
      val e = new GenericData.Record(pSchema)
      e.put("status", 1); e.put("data_file", df)
      e
    }
    val m = s"$root/metadata/m1.avro"
    writeAvro(m, pSchema, Seq(entry(f1, 19000, 2), entry(f2, 19005, 1)))
    val ml = s"$root/metadata/snap-1.avro"
    writeAvro(ml, manifestListSchema, Seq(manifestListRow(m, 0)))
    val schemaJson =
      """{"type":"struct","schema-id":0,"fields":[
        |  {"id":1,"name":"x","required":true,"type":"int"},
        |  {"id":2,"name":"ts","required":false,"type":"date"}]}""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version":2,"table-uuid":"t","location":"","last-sequence-number":1,
         |"last-updated-ms":0,"last-column-id":2,
         |"schemas":[$schemaJson],"current-schema-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[
         |  {"name":"ts_day","transform":"day","source-id":2,"field-id":1000}]}],
         |"default-spec-id":0,
         |"current-snapshot-id":1,"snapshots":[
         |  {"snapshot-id":1,"timestamp-ms":0,"manifest-list":${graft.core.Json.str(ml)}}]}""".stripMargin)

    val st = IcebergImport.state(spark, root)
    assert(st.identityFields.isEmpty)
    assert(st.partitionFields == Seq(IcebergImport.PartitionField("ts_day", "day", "ts")))
    // the filter names the SOURCE column with a source value; replay maps
    // it to the derived day and prunes to exactly the matching file
    val pruned = IcebergImport.read(spark, root, partitionFilter = Map("ts" -> d1.toString))
    assert(pruned.inputFiles.length == 1, "days() pruning must open only the matching file")
    assert(pruned.select(col("x")).collect().map(_.getInt(0)).toSet == Set(1, 2))
    val other = IcebergImport.read(spark, root, partitionFilter = Map("ts" -> d2.toString))
    assert(other.inputFiles.length == 1)
    assert(other.select(col("x")).collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("Iceberg type mapping covers primitives and nested struct/list/map") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def t(json: String) = IcebergImport.toSparkType(mapper.readTree(json))
    import org.apache.spark.sql.types._
    assert(t("\"int\"") == IntegerType)
    assert(t("\"timestamptz\"") == TimestampType)
    assert(t("\"timestamp\"") == TimestampNTZType) // no-zone => NTZ, not instant
    assert(t("\"decimal(18, 2)\"") == DecimalType(18, 2))
    assert(t("\"fixed[16]\"") == BinaryType)
    assert(t("\"uuid\"") == StringType)
    val nested = t(
      """{"type":"struct","fields":[
        |  {"id":1,"name":"a","required":true,"type":"long"},
        |  {"id":2,"name":"b","required":false,"type":{"type":"list","element-id":3,"element":"string","element-required":true}},
        |  {"id":4,"name":"c","required":false,"type":{"type":"map","key-id":5,"value-id":6,"key":"string","value":"double","value-required":false}}
        |]}""".stripMargin)
    assert(nested == StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", ArrayType(StringType, containsNull = false)),
      StructField("c", MapType(StringType, DoubleType, valueContainsNull = true)))))
    intercept[IllegalArgumentException](t("\"variant\""))
  }
}
