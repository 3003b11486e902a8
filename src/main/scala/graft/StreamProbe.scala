package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic: runs the q104 stream-stream interval join once and
  * prints per-batch StreamingQueryProgress durations (addBatch,
  * getBatch, commitOffsets, walCommit, stateOperators metrics) so the
  * fixed-cost split (state store vs scan vs planning) is measurable.
  * Round-18 evidence harness, not driver surface.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32, "graft-streamprobe")
    // A/B lever: SPROBE_PROVIDER=hdfs switches to the HDFS-backed (heap)
    // state store for a floor comparison against RocksDB
    if (sys.env.get("SPROBE_PROVIDER").contains("hdfs"))
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    sys.env.get("SPROBE_PARTS").foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    val t0 = System.nanoTime()
    val events = graft.sources.IO.table(spark, sfDir, "events")
    println(s"[sprobe] events rows=${events.count()} in ${(System.nanoTime() - t0) / 1e9}%s")

    // mirror q104 but keep the query handle for progress inspection
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    def src() = {
      val raw = spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet").parquet(sfDir)
      schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    }
    // A/B lever (round-19): SPROBE_SINGLE=1 derives both join sides from
    // ONE FileStreamSource (the q104 production shape since round-19);
    // default keeps the round-18 two-source shape for comparison.
    val single = sys.env.get("SPROBE_SINGLE").contains("1")
    val shared = src()
    def side() = if (single) shared else src()
    val clicks = side().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = side().filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"), col("value"))
    val joined = graft.streaming.Streaming
      .intervalJoin(clicks, purchases, "user_id", "click_ts", "purchase_ts", "30 minutes", "1 hour")
    val t1 = System.nanoTime()
    val q = joined.writeStream.format("memory").queryName("sprobe")
      .outputMode("append")
      .option("checkpointLocation",
        sys.env.getOrElse("SPROBE_CKPT", s"/dev/shm/sprobe-ckpt-${System.nanoTime()}"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    println(s"[sprobe] stream wall ${(System.nanoTime() - t1) / 1e9} s")
    q.recentProgress.foreach { p =>
      println(s"[sprobe] batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach(so =>
        println(s"[sprobe]   state: rowsTotal=${so.numRowsTotal} memUsed=${so.memoryUsedBytes} commitMs=${so.allUpdatesTimeMs}/${so.allRemovalsTimeMs}/${so.commitTimeMs} custom=${so.customMetrics}"))
    }
    spark.stop()
  }
}
