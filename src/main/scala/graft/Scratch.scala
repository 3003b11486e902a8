package graft

/** Dev profiling harness: times a named subset of SparkEntry.queries
  * warm, min-of-3 — Bench's methodology without the full suite, for
  * targeted A/B runs while iterating on one operator (not part of the
  * driver contract surface; SPARK_GRAFT_SF_DIR overrides the data dir).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32, "graft-scratch")
    val names = if (args.nonEmpty) args.toSeq else Seq("q85_ann_ivf_trained", "q90_ann_ivf_sampled")
    names.foreach { n => try SparkEntry.queries(n)(spark, sfDir).count() catch { case e: Throwable => println(s"$n warmup failed: $e") } }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
