package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives for training-data pipelines. No
  * `rand()` anywhere: every decision is a pure function of (id, salt), so
  * re-runs, retried tasks, and both engines of the oracle agree exactly,
  * and a sample is reproducible years later from the code alone.
  */
object Sampling {

  /** Hash bucket in [0, denom) for an id column — the shared primitive
    * under stratified splits (q62) and mixture sampling. md5-prefix based,
    * so DuckDB reproduces it as
    * `CAST(('0x'||substr(md5(id||salt),1,15)) AS BIGINT) % denom`.
    */
  def hashBucket(idCol: Column, denom: Long, salt: String = ""): Column = {
    val keyed = if (salt.isEmpty) idCol.cast("string") else concat(idCol.cast("string"), lit(salt))
    pmod(graft.plans.HashExpressions.md5Prefix60(keyed), lit(denom))
  }

  /** SOURCE-WEIGHTED MIXTURE SAMPLING: keep each row with its group's
    * rate — the "data mixing" step that turns a raw lake into a training
    * mixture (web at 0.3, books at 0.9, ...). Keep iff
    * `hashBucket(id) < round(rate(group) * denom)`; groups absent from
    * `rates` fall back to `defaultRate`. One narrow filter pass — no
    * shuffle, no driver state; rates fold into the plan as a literal CASE.
    * `salt` decorrelates independent samples drawn from the same corpus
    * (two mixtures with different salts overlap proportionally, not
    * identically).
    */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      denom: Long = 1000000L,
      salt: String = ""
  ): DataFrame = {
    require(denom > 0, "denom must be positive")
    (rates.values.toSeq :+ defaultRate).foreach(r => require(r >= 0.0 && r <= 1.0, s"rate $r outside [0,1]"))
    val bucket = hashBucket(col(idCol), denom, salt)
    val threshold = rates.toSeq.sortBy(_._1) match {
      case Seq() => lit(math.round(defaultRate * denom))
      case (g0, r0) +: rest =>
        rest
          .foldLeft(when(col(groupCol) === g0, lit(math.round(r0 * denom)))) { case (acc, (g, r)) =>
            acc.when(col(groupCol) === g, lit(math.round(r * denom)))
          }
          .otherwise(lit(math.round(defaultRate * denom)))
    }
    df.filter(bucket < threshold)
  }

  /** LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT: assign every row a split by
    * hashing its GROUP REPRESENTATIVE, not its own id — all members of a
    * duplicate group land in the same split, so exact duplicates can never
    * straddle train and test (the canonical eval-contamination bug).
    *
    * `groupKey` is the duplicate-group identity (e.g. `md5(text)` for
    * exact dups; a connected-component label from
    * [[Dedup.duplicateGroups]] for near-dups). The representative is the
    * group's minimum id — one window over the group key, no driver state.
    * Split thresholds are bucket counts out of `denom` (train gets
    * [0, trainBuckets), val the next `valBuckets`, test the rest).
    *
    * Scale: one shuffle on the group key (the window), then a narrow
    * hash+CASE projection. Hashing the representative (not the group key
    * itself) keeps the split decorrelated from the grouping function.
    */
  def groupSafeSplit(
      df: DataFrame,
      idCol: String,
      groupKey: Column,
      denom: Long = 10L,
      trainBuckets: Long = 8L,
      valBuckets: Long = 1L,
      salt: String = "split"
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupKey)
    val withRep = df.withColumn("rep_id", min(col(idCol)).over(w))
    splitFromRep(withRep, "rep_id", denom, trainBuckets, valBuckets, salt)
  }

  /** The split assignment itself, given an ALREADY-RESOLVED group
    * representative column (what [[groupSafeSplit]] derives with a window;
    * a near-dup pipeline passes its connected-component label instead —
    * see q126). Narrow projection, no shuffle.
    */
  def splitFromRep(
      df: DataFrame,
      repCol: String,
      denom: Long = 10L,
      trainBuckets: Long = 8L,
      valBuckets: Long = 1L,
      salt: String = "split"
  ): DataFrame = {
    require(denom > 0 && trainBuckets >= 0 && valBuckets >= 0 && trainBuckets + valBuckets <= denom,
      "splitFromRep: bucket counts must fit in denom")
    val bucket = hashBucket(col(repCol), denom, salt)
    df.withColumn(
      "split",
      when(bucket < trainBuckets, "train")
        .when(bucket < trainBuckets + valBuckets, "val")
        .otherwise("test")
    )
  }

  /** HASH-SAMPLED QUANTILES per group: the classic distributed quantile
    * recipe made deterministic — keep rows whose portable key hash lands
    * in bucket 0 of `sampleMod` (a reproducible 1-in-`sampleMod` sample,
    * NOT a seeded RNG: re-runs and the SQL oracle see the identical
    * sample), then take EXACT order statistics of the sample. The
    * quantile definition is lower-value-at-floored-rank:
    * rank = floor((n-1) * permille / 1000) + 1 — pure integer arithmetic,
    * no interpolation, so the emitted value is always a real data value
    * and replays exactly.
    *
    * Scale shape: the corpus-wide work is the narrow sample filter; only
    * sample rows (1/sampleMod of the data) shuffle into the per-group
    * rank window. Accuracy follows sample-quantile theory (error
    * O(1/sqrt(sample size)) in rank space); `sampleMod` is the lever.
    * Output: one row per (group, quantile) with the sample size alongside
    * so consumers can judge the estimate's weight.
    */
  def hashSampledQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      sampleKey: Column,
      sampleMod: Long,
      permilles: Seq[(String, Long)] = Seq("p50" -> 500L, "p90" -> 900L, "p99" -> 990L)
  ): DataFrame = {
    require(sampleMod >= 1, s"hashSampledQuantiles: sampleMod=$sampleMod must be >= 1")
    require(permilles.nonEmpty && permilles.forall { case (_, pm) => pm >= 0 && pm <= 1000 },
      "hashSampledQuantiles: permilles must be within [0, 1000]")
    val sample = graft.core.Caching.cached(
      df.filter(hashBucket(sampleKey, sampleMod) === 0)
        .select(col(groupCol).as("g"), valueCol.as("v"))
    )
    val counts = sample.groupBy(col("g")).agg(count(lit(1)).as("n_sample"))
    val targets = counts.select(
      col("g"), col("n_sample"),
      explode(array(permilles.map { case (q, pm) =>
        // integer floor division: the rank is exact, never a float rounding
        struct(lit(q).as("quantile"), (expr(s"((n_sample - 1) * ${pm}L) div 1000") + lit(1L)).as("rn"))
      }: _*)).as("t")
    ).select(col("g"), col("n_sample"), col("t.quantile").as("quantile"), col("t.rn").as("rn"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g")).orderBy(col("v"))
    val ranked = sample.withColumn("rn", row_number().over(w).cast("long"))
    ranked
      .join(targets, Seq("g", "rn"))
      .select(col("g"), col("quantile"), col("n_sample"), col("v").as("value"))
  }

  /** PER-DOMAIN QUOTA CAPPING (the Common-Crawl curation rule "at most
    * N pages per domain"): keep a deterministic uniform sample of up to
    * `maxPerDomain` ids per domain, chosen by portable-hash rank
    * (md5-prefix of the id — no RNG, so retries and both oracle engines
    * agree). Output (domain, rk, id) with rk = 1-based rank.
    *
    * SCALE: per-domain selection runs through the k-bounded-heap
    * Aggregator ([[graft.plans.TopKByScoreAgg]]), so a degenerate
    * million-page domain contributes at most k rows per map partition to
    * the shuffle and NEVER a full per-domain sort — the window-function
    * formulation (row_number over a domain partition) would sort the
    * whole skewed domain on one task; this shape caps it at
    * O(k·partitions) merged in the reduce.
    */
  /** BALANCED CLASS DOWNSAMPLING: keep exactly min-class-size rows per
    * label, selected deterministically by portable-hash rank (no RNG) —
    * the class-rebalancing step before training on skewed labels. The
    * min class size enters the plan as a broadcast scalar, not a driver
    * round-trip; selection reuses [[domainCap]]'s hash-rank rule so a
    * class's keep-set is stable as OTHER classes grow.
    *
    * SCALE: one count aggregation + one per-label rank window. The
    * window sorts each label's rows — fine for the balanced-training
    * use (labels are comparable in size by construction after capping);
    * a pathologically dominant label should be pre-capped with
    * [[domainCap]]'s bounded-heap shape instead.
    */
  def balancedDownsample(df: DataFrame, labelCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = df.groupBy(col(labelCol)).agg(count(lit(1)).as("__c")).agg(min(col("__c")).as("__m"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(graft.plans.HashExpressions.md5Prefix60(col(idCol).cast("string")).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(m))
      .filter(col("__rk") <= col("__m"))
      .drop("__rk", "__m")
  }

  def domainCap(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      domainCol: String,
      idCol: String,
      maxPerDomain: Int
  ): DataFrame = {
    import spark.implicits._
    require(maxPerDomain > 0, s"maxPerDomain=$maxPerDomain must be positive")
    val agg = new graft.plans.TopKByScoreAgg(maxPerDomain)
    df.select(
      col(domainCol).cast("string"),
      col(idCol).cast("long"),
      graft.plans.HashExpressions.md5Prefix60(col(idCol).cast("string"))
    )
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._3, t._2)) // (score = hash, id)
      .agg(agg.toColumn)
      .flatMap { case (d, ranked) => ranked.map { case (rk, id, _) => (d, rk, id) } }
      .toDF(domainCol, "rk", idCol)
  }

  /** TEMPERATURE-WEIGHTED MIXTURE UPSAMPLING — the training-data recipe's
    * fractional repetition knob ("see Wikipedia 2.3 epochs, CommonCrawl
    * 0.6"): every row is emitted floor(w) times plus one more with
    * probability frac(w), decided by the portable md5-prefix hash of the
    * row id (NO RNG — retries, both oracle engines, and any partitioning
    * reproduce the same copies). Weights are e4-scaled rationals per
    * domain; w < 1e4 degrades to a plain Bernoulli downsample, so one
    * operator covers both directions of the mixture.
    *
    * SCALE: zero shuffles — the weight lookup is a broadcast literal map,
    * the copy count is per-row integer arithmetic, and the repetition is
    * one `explode(sequence(...))` inside the scan's projection. Output
    * size is Σ w_d · |d| by construction.
    */
  def upsampleMixture(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      weightsE4: Map[String, Long],
      defaultE4: Long = 10000L // unlisted domains pass through once
  ): DataFrame = {
    require(weightsE4.nonEmpty, "upsampleMixture: weightsE4 must be non-empty")
    require(weightsE4.values.forall(_ >= 0L) && defaultE4 >= 0L, "upsampleMixture: weights must be >= 0")
    val wCol = weightsE4.toSeq.sortBy(_._1).foldLeft(lit(defaultE4)) { case (acc, (d, w)) =>
      when(col(domainCol) === d, lit(w)).otherwise(acc)
    }
    val h = pmod(graft.plans.HashExpressions.md5Prefix60(col(idCol).cast("string")), lit(10000L))
    df.withColumn("__w", wCol)
      .withColumn(
        // integer div, not double division: a double quotient's ulp can
        // swallow the fractional part for extreme weights and emit an
        // extra copy the oracle's `//` never would
        "n_copies",
        expr("__w div 10000L") + when(h < col("__w") % 10000L, 1L).otherwise(0L))
      .filter(col("n_copies") > 0L)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("n_copies"))))
      .drop("__w")
  }

  /** IMPORTANCE SAMPLING by per-row acceptance weight (the DSIR /
    * quality-weighted-selection shape, Xie et al. 2023): each row
    * carries its own acceptance probability as an e4-scaled integer
    * column (0 = drop, 10000 = always keep), and is kept iff the
    * portable hash indicator md5(seed:id) % 10000 falls under it —
    * NO RNG, so the selected subset is reproducible bit-for-bit and
    * nested (a higher-weight run keeps a superset row-for-row at any
    * fixed seed). Weights outside [0, 10000] clamp rather than error:
    * upstream scores are unbounded by contract.
    *
    * SCALE: a zero-shuffle filter in the scan projection — the weight
    * column arrives from whatever scoring pass produced it, and the
    * indicator is one codegen'd hash per row.
    */
  def importanceSample(df: DataFrame, idCol: String, weightE4Col: String, seed: String): DataFrame =
    df.filter(
      pmod(
        graft.plans.HashExpressions.md5Prefix60(concat(lit(seed), lit(":"), col(idCol).cast("string"))),
        lit(10000L)
      ) < greatest(lit(0L), least(lit(10000L), col(weightE4Col).cast("long")))
    )
}
