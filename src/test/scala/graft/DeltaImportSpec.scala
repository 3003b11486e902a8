package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaExport, DeltaImport, VersionedTable}

/** Import half of the Delta interop story: log replay must reconstruct
  * exactly what the exporter (and any compliant Delta writer) committed —
  * including time travel, the append-only change feed, and partition-column
  * reconstruction for hive-style tables.
  */
class DeltaImportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Int)] =
    df.select(col("bucket"), col("x")).collect().map(r => (r.getString(0), r.getInt(1))).toSet

  test("round-trip: import of an exported VersionedTable matches the manifest read") {
    val path = Files.createTempDirectory("graft-dimp").toString + "/t"
    VersionedTable.commitDelta(spark, path,
      Seq(("a", 1), ("a", 2), ("b", 3)).toDF("bucket", "x"), "bucket")
    val v0Expect = rows(VersionedTable.read(spark, path))
    VersionedTable.commitDelta(spark, path,
      Seq(("b", 30), ("b", 31)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)

    assert(rows(DeltaImport.read(spark, path)) == rows(VersionedTable.read(spark, path)))
    // time travel: delta version 0 is the first committed snapshot
    assert(rows(DeltaImport.read(spark, path, versionAsOf = Some(0L))) == v0Expect)
    // change feed since version 0: exactly the partition-b rewrite, tagged
    val ch = DeltaImport.readChanges(spark, path, sinceVersion = 0L)
      .select(col("bucket"), col("x"), col("_commit_version"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(ch == Set(("b", 30, 1L), ("b", 31, 1L)))
  }

  test("tail: checkpointed per-commit consumption, restart-safe, no re-delivery") {
    val base = Files.createTempDirectory("graft-dtail").toString
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"
    VersionedTable.commitDelta(spark, path, Seq(("a", 1)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("b", 2)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)

    var seen = Vector.empty[(Long, Set[(String, Int)])]
    def collect(df: org.apache.spark.sql.DataFrame, v: Long): Unit =
      seen :+= (v, rows(df))
    assert(DeltaImport.tail(spark, path, ckpt, collect) == 1L)
    assert(seen == Vector((0L, Set(("a", 1))), (1L, Set(("b", 2)))))

    // no new commits: offset holds, nothing re-delivered
    seen = Vector.empty
    assert(DeltaImport.tail(spark, path, ckpt, collect) == 1L)
    assert(seen.isEmpty)

    // a third commit appears (writer keeps writing, log re-exported):
    // exactly the new version is delivered
    VersionedTable.commitDelta(spark, path, Seq(("a", 10), ("c", 3)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)
    assert(DeltaImport.tail(spark, path, ckpt, collect) == 2L)
    assert(seen == Vector((2L, Set(("a", 10), ("c", 3)))))
  }

  test("hive-style partitioned table: partition column reconstructed, one discovery scan") {
    val root = Files.createTempDirectory("graft-dimp-part").toString
    def writePart(dir: String, xs: Seq[Int]): String = {
      TableFixtures.writeSinglePartParquet(xs.toDF("x"), s"$root/$dir/part-0.parquet")
      s"$dir/part-0.parquet"
    }
    val fa = writePart("p=a", Seq(1, 2))
    val fb = writePart("p=b", Seq(3))
    val schema = new StructType().add("x", "integer").add("p", "string")
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":["p"],"configuration":{}}}"""
    def add(p: String, pv: String) =
      s"""{"add":{"path":${graft.core.Json.str(p)},"partitionValues":{"p":${graft.core.Json.str(pv)}},"size":1,"modificationTime":0,"dataChange":true}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
        add(fa, "a"), add(fb, "b")).mkString("", "\n", "\n"))

    val got = DeltaImport.read(spark, root)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "a"), (2, "a"), (3, "b")))
    assert(DeltaImport.read(spark, root).columns.toSeq == Seq("x", "p"))

    // the 100 TB property: a filter on the partition column must prune at
    // PLAN time (PartitionFilters on the scan), not post-scan — i.e. the
    // basePath read kept p a real partition column, and only p=a's file is
    // touched
    val filtered = DeltaImport.read(spark, root).filter(col("p") === "a")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    // the p = a predicate must appear under PartitionFilters (plan-time
    // pruning), NOT under PushedFilters/data filters (post-scan)
    assert(scan.contains("PartitionFilters: [isnotnull(p#"),
      s"expected partition-time pruning on p, got:\n$scan")
    assert(scan.replaceAll("(?s)PushedFilters.*", "").contains(" = a)"),
      s"expected (p = a) inside PartitionFilters, got:\n$scan")
  }

  test("non-hive layout falls back to authoritative partitionValues") {
    val root = Files.createTempDirectory("graft-dimp-flat").toString
    TableFixtures.writeSinglePartParquet(Seq(7).toDF("x"), s"$root/flat/part-0.parquet")
    val f = new java.io.File(s"$root/flat/part-0.parquet")
    val schema = new StructType().add("x", "integer").add("p", "string")
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":["p"],"configuration":{}}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq(meta,
        s"""{"add":{"path":${graft.core.Json.str(s"flat/${f.getName}")},"partitionValues":{"p":"z"},"size":1,"modificationTime":0,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val got = DeltaImport.read(spark, root).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((7, "z")))
  }

  test("randomized commit sequences round-trip through export+import at every version") {
    // deterministic pseudo-random op sequences: each op commits a delta to
    // 1-2 of 3 buckets or deletes a bucket's evens; after export, the
    // import must match the manifest read, and time travel must replay
    // every intermediate state exactly
    for (trial <- 0 until 3) {
      val path = Files.createTempDirectory(s"graft-dimp-prop$trial").toString + "/t"
      // shared semantics model (TableFixtures): delta commits replace the
      // touched buckets, deleteWhere drops a bucket's matching rows
      val expectedAt = TableFixtures.randomCommitSequence(spark, path, seed = 20260812L + trial)
      DeltaExport.export(spark, path)
      import TableFixtures.got
      assert(got(DeltaImport.read(spark, path)) == expectedAt.last._2, s"trial $trial newest")
      // exported delta versions are renumbered gap-free in commit order
      expectedAt.zipWithIndex.foreach { case ((_, exp), i) =>
        assert(got(DeltaImport.read(spark, path, versionAsOf = Some(i.toLong))) == exp,
          s"trial $trial version $i")
      }
    }
  }

  /** Simulate a Delta writer's checkpoint at `version` + vacuum of the JSON
    * commits at-or-below it: one parquet row per action (same struct fields
    * the JSON actions carry), written as a single-part checkpoint or split
    * into a complete multi-part `NNN.checkpoint.MMM.NNN.parquet` set with
    * the metaData/protocol actions in part 1.
    */
  private def plantCheckpoint(path: String, st: DeltaImport.TableState, version: Long, nParts: Int): Unit = {
    val addRows = st.liveFiles.map { case (p, pv) =>
      (Some((p, pv, 1L, 0L, true)), None: Option[(String, String, Seq[String])], None: Option[(Int, Int)])
    }
    val metaRow = (None: Option[(String, Map[String, String], Long, Long, Boolean)],
      Some(("t", st.schema.json, Seq.empty[String])), None: Option[(Int, Int)])
    val protoRow = (None: Option[(String, Map[String, String], Long, Long, Boolean)],
      None: Option[(String, String, Seq[String])], Some((1, 2)))
    def write(rowsPart: Seq[(Option[(String, Map[String, String], Long, Long, Boolean)], Option[(String, String, Seq[String])], Option[(Int, Int)])], name: String): Unit = {
      val ck = rowsPart
        .toDF("add", "metaData", "protocol")
        .select(
          col("add").cast(
            "struct<path:string,partitionValues:map<string,string>,size:bigint,modificationTime:bigint,dataChange:boolean>").as("add"),
          col("metaData").cast(
            "struct<id:string,schemaString:string,partitionColumns:array<string>>").as("metaData"),
          col("protocol").cast("struct<minReaderVersion:int,minWriterVersion:int>").as("protocol"))
      TableFixtures.writeSinglePartParquet(ck, s"$path/_delta_log/$name")
    }
    if (nParts == 1) write(addRows :+ metaRow :+ protoRow, f"$version%020d.checkpoint.parquet")
    else {
      val chunks = addRows.grouped(math.max(1, (addRows.size + nParts - 1) / nParts)).toSeq.padTo(nParts, Nil)
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val withActions = if (i == 0) chunk :+ metaRow :+ protoRow else chunk
        write(withActions, f"$version%020d.checkpoint.${i + 1}%010d.$nParts%010d.parquet")
      }
    }
    (0L to version).foreach { v =>
      new java.io.File(s"$path/_delta_log/" + f"$v%020d.json").delete()
    }
  }

  test("checkpoint-compacted log: state recovered from checkpoint parquet, pre-history errors as vacuumed") {
    val path = Files.createTempDirectory("graft-dimp-ckpt").toString + "/t"
    VersionedTable.commitDelta(spark, path, Seq(("a", 1), ("b", 2)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("b", 20)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("c", 3)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)
    val expectAll = rows(DeltaImport.read(spark, path))
    val expectV1 = rows(DeltaImport.read(spark, path, versionAsOf = Some(1L)))
    plantCheckpoint(path, DeltaImport.state(spark, path, versionAsOf = Some(1L)), 1L, nParts = 1)

    assert(rows(DeltaImport.read(spark, path)) == expectAll)
    // the checkpoint itself is addressable and replays to the same v1 state
    assert(rows(DeltaImport.read(spark, path, versionAsOf = Some(1L))) == expectV1)
    // ...but history below it was vacuumed
    val e = intercept[IllegalArgumentException](DeltaImport.read(spark, path, versionAsOf = Some(0L)))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("versionAsOf BETWEEN two surviving checkpoints replays from the older one") {
    val path = Files.createTempDirectory("graft-dimp-2ckpt").toString + "/t"
    Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5)).foreach { case (b, x) =>
      VersionedTable.commitDelta(spark, path, Seq((b, x)).toDF("bucket", "x"), "bucket")
    }
    DeltaExport.export(spark, path)
    val expectV2 = rows(DeltaImport.read(spark, path, versionAsOf = Some(2L)))
    val expectAll = rows(DeltaImport.read(spark, path))
    val st1 = DeltaImport.state(spark, path, versionAsOf = Some(1L))
    val st3 = DeltaImport.state(spark, path, versionAsOf = Some(3L))
    // plantCheckpoint(3) vacuums JSON 0..3 — back up 2,3 and restore them so
    // the log ends up: JSON {2,3,4}, checkpoints {1,3}
    val log = s"$path/_delta_log"
    val keep = Seq(2L, 3L).map(v => f"$v%020d.json")
    val backup = keep.map(n => n -> java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$log/$n")))
    plantCheckpoint(path, st3, 3L, nParts = 1)
    backup.foreach { case (n, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$log/$n"), bytes)
    }
    plantCheckpoint(path, st1, 1L, nParts = 1)

    // a target BETWEEN the checkpoints must replay ckpt1 + JSON 2 — not fail
    // because the NEWEST checkpoint (3) happens to be later than the target
    assert(rows(DeltaImport.read(spark, path, versionAsOf = Some(2L))) == expectV2)
    // newest read picks the later checkpoint + JSON 4
    assert(rows(DeltaImport.read(spark, path)) == expectAll)
    // below the OLDEST usable checkpoint is genuinely vacuumed
    val e = intercept[IllegalArgumentException](DeltaImport.read(spark, path, versionAsOf = Some(0L)))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("multi-part checkpoint set replays like a single-part one; incomplete sets are refused") {
    val path = Files.createTempDirectory("graft-dimp-ckptmp").toString + "/t"
    VersionedTable.commitDelta(spark, path, Seq(("a", 1), ("b", 2), ("c", 3)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("b", 20)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("d", 4)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)
    val expectAll = rows(DeltaImport.read(spark, path))
    val expectV1 = rows(DeltaImport.read(spark, path, versionAsOf = Some(1L)))
    plantCheckpoint(path, DeltaImport.state(spark, path, versionAsOf = Some(1L)), 1L, nParts = 2)
    // a stray part from an ABANDONED attempt with a different declared
    // count (1 of 3) must not poison the complete 2-part set
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$path/_delta_log/" + f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"),
      java.nio.file.Paths.get(s"$path/_delta_log/" + f"${1L}%020d.checkpoint.${1}%010d.${3}%010d.parquet"))

    assert(rows(DeltaImport.read(spark, path)) == expectAll)
    assert(rows(DeltaImport.read(spark, path, versionAsOf = Some(1L))) == expectV1)

    // drop part 2 of 2: the set is incomplete and must be refused loudly,
    // not replayed from half the actions
    new java.io.File(s"$path/_delta_log/" + f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet").delete()
    val e = intercept[IllegalArgumentException](DeltaImport.read(spark, path))
    assert(e.getMessage.contains("checkpoint"))
  }

  test("tail re-seeds from the checkpoint snapshot when the offset predates surviving history") {
    val base = Files.createTempDirectory("graft-dtail-ckpt").toString
    val path = s"$base/t"
    VersionedTable.commitDelta(spark, path, Seq(("a", 1)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("b", 2)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("c", 3)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, path, Seq(("d", 4)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)
    // writer checkpointed at v2 and vacuumed JSONs 0..2; commit v3 survives
    plantCheckpoint(path, DeltaImport.state(spark, path, versionAsOf = Some(2L)), 2L, nParts = 1)

    var seen = Vector.empty[(Long, Set[(String, Int)])]
    def collect(df: org.apache.spark.sql.DataFrame, v: Long): Unit = seen :+= (v, rows(df))

    // consumer whose offset (0) was overtaken by the vacuum: first batch is
    // the cumulative snapshot at the checkpoint version, then per-commit
    val slowCkpt = s"$base/slow"
    new java.io.File(slowCkpt).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$slowCkpt/offset"), "0")
    assert(DeltaImport.tail(spark, path, slowCkpt, collect) == 3L)
    assert(seen == Vector(
      (2L, Set(("a", 1), ("b", 2), ("c", 3))),
      (3L, Set(("d", 4)))))

    // brand-new consumer against the already-compacted table: same re-seed
    seen = Vector.empty
    assert(DeltaImport.tail(spark, path, s"$base/fresh", collect) == 3L)
    assert(seen.map(_._1) == Vector(2L, 3L))

    // up-to-date consumer: nothing re-delivered
    seen = Vector.empty
    assert(DeltaImport.tail(spark, path, slowCkpt, collect) == 3L)
    assert(seen.isEmpty)
  }

  test("migration shadow-read: deltaTailIntoWarehouse is exactly-once across offset loss and new commits") {
    val base = Files.createTempDirectory("graft-dtail-wh").toString
    val src = s"$base/src"; val wh = s"$base/wh"; val ck = s"$base/ck"
    VersionedTable.commitDelta(spark, src, Seq(("a", 1), ("b", 2)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, src, Seq(("b", 20)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, src)
    def ts(v: Long) = lit(s"2024-01-0${v + 1} 00:00:00").cast("timestamp")
    def run(): Long = graft.streaming.Streaming.deltaTailIntoWarehouse(
      spark, src, ck, wh, Seq("bucket"), nBuckets = 4, now = ts, streamId = "mig")
    def latest: Set[(String, Int)] =
      VersionedTable.read(spark, wh).filter(col("actv_flg") === "Y")
        .select(col("bucket"), col("x")).collect().map(r => (r.getString(0), r.getInt(1))).toSet

    assert(run() == 1L)
    // v1 rewrote bucket b: the SCD-2 warehouse closes b=2 and serves b=20
    assert(latest == Set(("a", 1), ("b", 20)))
    val commitsAfterFirst = VersionedTable.latestVersion(spark, wh).get

    // crash-replay: the tail offset is lost; both versions re-deliver and
    // the stream_batch markers (keyed by source version) no-op them — no
    // new warehouse commits, no duplicate SCD closes
    new java.io.File(s"$ck/offset").delete()
    assert(run() == 1L)
    assert(VersionedTable.latestVersion(spark, wh).get == commitsAfterFirst)
    assert(latest == Set(("a", 1), ("b", 20)))

    // vacuum overtakes the consumer: the writer commits v2 and v3, then
    // checkpoints at v2 and vacuums JSONs 0..2 — the consumer (offset 1)
    // now receives v2 as the CUMULATIVE re-seed snapshot {a,b20,c}, a
    // superset of what it already applied, under a version the marker has
    // never seen. Content-level change detection must apply ONLY the new
    // row: no phantom SCD closes of a/b (history count unchanged), one
    // warehouse commit for c, then v3 applies normally.
    val closedBefore = VersionedTable.read(spark, wh).filter(col("actv_flg") === "N").count()
    VersionedTable.commitDelta(spark, src, Seq(("c", 3)).toDF("bucket", "x"), "bucket")
    VersionedTable.commitDelta(spark, src, Seq(("d", 4)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, src)
    plantCheckpoint(src, DeltaImport.state(spark, src, versionAsOf = Some(2L)), 2L, nParts = 1)
    assert(run() == 3L)
    assert(latest == Set(("a", 1), ("b", 20), ("c", 3), ("d", 4)))
    // the re-seed superset closed nothing: the only historic row is still
    // the original b=2 close, and exactly two commits landed (c, then d)
    assert(VersionedTable.read(spark, wh).filter(col("actv_flg") === "N").count() == closedBefore)
    assert(VersionedTable.latestVersion(spark, wh).get == commitsAfterFirst + 2)
  }

  // --- deletion vectors (minReaderVersion 3, merge-on-read) ---

  private def dvJson(storage: String, pathOrInline: String, offset: Int, size: Int, card: Long): String =
    s""""deletionVector":{"storageType":"$storage","pathOrInlineDv":${graft.core.Json.str(pathOrInline)},""" +
      s""""offset":$offset,"sizeInBytes":$size,"cardinality":$card}"""

  private def addJson(path: String, dv: Option[String] = None): String =
    s"""{"add":{"path":${graft.core.Json.str(path)},"partitionValues":{},"size":1,"modificationTime":0,""" +
      s""""dataChange":true${dv.map("," + _).getOrElse("")}}}"""

  private val protoV3 =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}"""

  private def metaJsonFor(schema: StructType): String =
    s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":[],"configuration":{}}}"""

  test("deletion vectors: u-storage DV drops exactly its row indexes; time travel restores; rewrite clears") {
    import graft.sources.DeltaDv
    val root = Files.createTempDirectory("graft-dimp-dvu").toString
    TableFixtures.writeSinglePartParquet(
      (0 until 6).map(i => (i.toLong, s"r$i")).toDF("id", "v").orderBy("id").coalesce(1),
      s"$root/f0.parquet")
    TableFixtures.writeSinglePartParquet(
      Seq((100L, "x")).toDF("id", "v"), s"$root/f1.parquet")
    // DV for f0: rows 1, 3, 4 deleted; framed .bin under a u-storage path
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = DeltaDv.base85Encode(bb.array())
    val (bin, off, size) = DeltaDv.frameFile(DeltaDv.encodePortable(Seq(1L, 3L, 4L)))
    Files.write(java.nio.file.Paths.get(s"$root/deletion_vector_$uuid.bin"), bin)

    val schema = new StructType().add("id", "long").add("v", "string")
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq(protoV3, metaJsonFor(schema), addJson("f0.parquet"), addJson("f1.parquet")).mkString("", "\n", "\n"))
    // version 1: a DELETE re-adds f0 with its DV (what Delta DML does)
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000001.json"),
      Seq(addJson("f0.parquet", Some(dvJson("u", enc, off, size, 3)))).mkString("", "\n", "\n"))

    def ids(v: Option[Long]) =
      DeltaImport.read(spark, root, v).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids(Some(0L)) == Set(0L, 1L, 2L, 3L, 4L, 5L, 100L), "pre-DV version must see every row")
    assert(ids(None) == Set(0L, 2L, 5L, 100L), "DV rows must vanish, other files untouched")
    // version 2: compaction rewrites f0 without a DV -> deletes are baked
    // in elsewhere; the re-add must CLEAR the stale DV
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000002.json"),
      Seq(addJson("f0.parquet")).mkString("", "\n", "\n"))
    assert(ids(None) == Set(0L, 1L, 2L, 3L, 4L, 5L, 100L), "DV-less re-add must clear the DV")
  }

  test("deletion vectors: inline (i-storage) payload, zero-padded to base85 alignment") {
    import graft.sources.DeltaDv
    val root = Files.createTempDirectory("graft-dimp-dvi").toString
    TableFixtures.writeSinglePartParquet(
      (0 until 4).map(i => (i.toLong, i * 10)).toDF("id", "x").orderBy("id").coalesce(1),
      s"$root/f0.parquet")
    val payload = DeltaDv.encodePortable(Seq(0L, 2L))
    val padded = payload ++ Array.fill[Byte]((4 - payload.length % 4) % 4)(0)
    val inline = DeltaDv.base85Encode(padded)
    val schema = new StructType().add("id", "long").add("x", "integer")
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq(protoV3, metaJsonFor(schema),
        addJson("f0.parquet", Some(dvJson("i", inline, 0, payload.length, 2)))).mkString("", "\n", "\n"))
    val got = DeltaImport.read(spark, root).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("deletion vectors: readChanges applies the batch's DV to its own adds") {
    import graft.sources.DeltaDv
    val root = Files.createTempDirectory("graft-dimp-dvc").toString
    TableFixtures.writeSinglePartParquet(
      (0 until 3).map(i => (i.toLong, s"c$i")).toDF("id", "v").orderBy("id").coalesce(1),
      s"$root/f0.parquet")
    val payload = DeltaDv.encodePortable(Seq(1L))
    val padded = payload ++ Array.fill[Byte]((4 - payload.length % 4) % 4)(0)
    val schema = new StructType().add("id", "long").add("v", "string")
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq(protoV3, metaJsonFor(schema),
        addJson("f0.parquet", Some(dvJson("i", DeltaDv.base85Encode(padded), 0, payload.length, 1)))).mkString("", "\n", "\n"))
    val changed = DeltaImport.readChanges(spark, root, sinceVersion = -1L)
    assert(changed.select(col("id")).collect().map(_.getLong(0)).toSet == Set(0L, 2L))
  }

  test("name-mode column mapping: physical col-<uuid> parquet names read back as logical columns") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-dimp-cm").toString
    // data file carries PHYSICAL names, including a nested struct field —
    // the shape modern Delta writers produce by default on new tables
    TableFixtures.writeSinglePartParquet(
      Seq((7, 70), (8, 80)).toDF("v1", "v2")
        .select(col("v1").as("col-x1"), struct(col("v2").as("col-a9")).as("col-s5")),
      s"$root/flat/part-0.parquet")
    // logical schema: field metadata records each physicalName (+ id)
    def mapMeta(phys: String, id: Long): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id)
      .build()
    val schema = StructType(Seq(
      StructField("x", IntegerType, nullable = true, mapMeta("col-x1", 1)),
      StructField("s",
        StructType(Seq(StructField("a", IntegerType, nullable = true, mapMeta("col-a9", 3)))),
        nullable = true, mapMeta("col-s5", 2))
    ))
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", meta,
        s"""{"add":{"path":"flat/part-0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val df = DeltaImport.read(spark, root)
    assert(df.schema.fieldNames.toSeq == Seq("x", "s"))
    assert(df.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("a"),
      "nested struct fields must rename back to logical names")
    val got = df.select(col("x"), col("s.a")).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((7, 70), (8, 80)))
  }

  test("name-mode column mapping: partitioned table with physically-keyed partitionValues") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-dimp-cmp").toString
    // partition dirs and partitionValues keys use the PHYSICAL name, as the
    // Delta protocol specifies under column mapping
    TableFixtures.writeSinglePartParquet(
      Seq(1, 2).toDF("col-x1"), s"$root/col-p7=a/part-0.parquet")
    TableFixtures.writeSinglePartParquet(
      Seq(3).toDF("col-x1"), s"$root/col-p7=b/part-0.parquet")
    def mapMeta(phys: String, id: Long): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id)
      .build()
    val schema = StructType(Seq(
      StructField("x", IntegerType, nullable = true, mapMeta("col-x1", 1)),
      StructField("p", StringType, nullable = true, mapMeta("col-p7", 2))
    ))
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":["p"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}"""
    def add(p: String, pv: String) =
      s"""{"add":{"path":${graft.core.Json.str(p)},"partitionValues":{"col-p7":${graft.core.Json.str(pv)}},"size":1,"modificationTime":0,"dataChange":true}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", meta,
        add("col-p7=a/part-0.parquet", "a"), add("col-p7=b/part-0.parquet", "b")
      ).mkString("", "\n", "\n"))
    val got = DeltaImport.read(spark, root)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "a"), (2, "a"), (3, "b")))
  }

  test("id-mode column mapping: columns resolve by parquet field id, not name — heterogeneous files read correctly") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-dimp-cmid").toString
    // two data files whose PHYSICAL column names differ (the scenario id
    // mode exists for: renames without rewrites) — only the parquet field
    // ids line up. Write-side: Spark stamps ids into the footer for schema
    // fields carrying parquet.field.id metadata.
    def idMeta(id: Long): Metadata =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    def fileDf(name1: String, name2: String, rows: Seq[(Int, String)]) = {
      val base = rows.toDF("a", "b")
      spark.createDataFrame(base.rdd, StructType(Seq(
        StructField(name1, IntegerType, nullable = true, idMeta(1)),
        StructField(name2, StringType, nullable = true, idMeta(2)))))
    }
    TableFixtures.writeSinglePartParquet(
      fileDf("old_name", "old_val", Seq((1, "u"))), s"$root/f0.parquet")
    TableFixtures.writeSinglePartParquet(
      fileDf("renamed", "v_new", Seq((2, "w"))), s"$root/f1.parquet")
    // logical schema: ids are authoritative; the recorded physicalName
    // matches NEITHER file, so any name-based read would return nulls/fail
    def mapMeta(phys: String, id: Long): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id)
      .build()
    val schema = StructType(Seq(
      StructField("x", IntegerType, nullable = true, mapMeta("col-x1", 1)),
      StructField("v", StringType, nullable = true, mapMeta("col-v2", 2))))
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id"}}}"""
    def add(p: String) =
      s"""{"add":{"path":${graft.core.Json.str(p)},"partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", meta,
        add("f0.parquet"), add("f1.parquet")).mkString("", "\n", "\n"))
    val df = DeltaImport.read(spark, root)
    assert(df.schema.fieldNames.toSeq == Seq("x", "v"))
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "u"), (2, "w")))
  }

  test("name-mode column mapping: a logical RENAME across commits survives replay — latest name at head, original under time travel") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-dimp-cmren").toString
    // the operation column mapping exists for: commit 1 renames logical
    // column x -> y by re-issuing metaData with a new logical name over
    // the SAME physicalName — zero data files rewritten
    TableFixtures.writeSinglePartParquet(
      Seq(1, 2).toDF("v").select(col("v").as("col-x1")), s"$root/f0.parquet")
    TableFixtures.writeSinglePartParquet(
      Seq(3).toDF("v").select(col("v").as("col-x1")), s"$root/f1.parquet")
    def mapMeta(phys: String, id: Long): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id)
      .build()
    def meta(logical: String) = {
      val schema = StructType(Seq(
        StructField(logical, IntegerType, nullable = true, mapMeta("col-x1", 1))))
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}"""
    }
    def add(p: String) =
      s"""{"add":{"path":${graft.core.Json.str(p)},"partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", meta("x"),
        add("f0.parquet")).mkString("", "\n", "\n"))
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000001.json"),
      Seq(meta("y"), add("f1.parquet")).mkString("", "\n", "\n"))
    // head: both files (pre- and post-rename) read under the NEW name
    val head = DeltaImport.read(spark, root)
    assert(head.schema.fieldNames.toSeq == Seq("y"))
    assert(head.select(col("y")).collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    // time travel to v0: the ORIGINAL logical name
    val v0 = DeltaImport.read(spark, root, versionAsOf = Some(0))
    assert(v0.schema.fieldNames.toSeq == Seq("x"))
    assert(v0.select(col("x")).collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("id-mode column mapping: a field without delta.columnMapping.id is refused, not name-matched") {
    val root = Files.createTempDirectory("graft-dimp-cmid-e").toString
    TableFixtures.writeSinglePartParquet(Seq(7).toDF("x"), s"$root/f0.parquet")
    val schema = new StructType().add("x", "integer") // no mapping metadata
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id"}}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", meta,
        s"""{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val e = intercept[IllegalArgumentException](DeltaImport.read(spark, root))
    assert(e.getMessage.contains("delta.columnMapping.id"))
  }

  test("explicit errors: compacted log without a usable checkpoint, unsupported reader features") {
    val root = Files.createTempDirectory("graft-dimp-err").toString
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000005.json"),
      """{"commitInfo":{}}""" + "\n")
    val e = intercept[IllegalArgumentException](DeltaImport.read(spark, root))
    assert(e.getMessage.contains("checkpoint"))

    // reader features we don't implement: refused by name, never silently
    // misread (v2Checkpoint changes the checkpoint layout itself)
    val dvRoot = Files.createTempDirectory("graft-dimp-rf").toString
    new java.io.File(s"$dvRoot/_delta_log").mkdirs()
    val schemaJson = graft.core.Json.str(
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").json)
    Files.writeString(
      java.nio.file.Paths.get(s"$dvRoot/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","v2Checkpoint"]}}
         |{"metaData":{"id":"t","schemaString":$schemaJson,"partitionColumns":[],"configuration":{}}}
         |""".stripMargin)
    val dv = intercept[IllegalArgumentException](DeltaImport.read(spark, dvRoot))
    assert(dv.getMessage.contains("v2Checkpoint"))
  }
}
