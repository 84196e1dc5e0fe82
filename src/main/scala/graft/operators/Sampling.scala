package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation — the step
  * between corpus filtering and training-set assembly: down-sample
  * over-represented strata (language, source, domain) to a target mix
  * without ever materializing a shuffle of the full corpus.
  *
  * Everything keys off a salted 60-bit md5 hash of a stable row key, so
  * samples are (a) reproducible run-to-run, (b) consistent across engines
  * (the DuckDB oracle replays the exact hash, q38), and (c) coordinated:
  * two datasets sampled with the same salt and key agree on membership,
  * which is how you keep doc↔embedding pairs aligned across separately
  * sampled tables.
  */
object Sampling {

  /** Salted portable 60-bit hash of a key column: first 15 hex chars of
    * md5, base-16 parsed (same family as Dedup's portable sketches).
    * Uniform on [0, 2^60); bigints render identically as strings on both
    * engines, so any stable key column works. */
  def hashKey(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** `floor(rate · 2^60)` as an exact long — the membership threshold.
    * Computed in BigDecimal so the driver-side literal is bit-identical to
    * what an oracle computes from the same rate. */
  def rateThreshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    (BigDecimal(rate) * BigDecimal(2).pow(60))
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
  }

  /** Deterministic Bernoulli sample: keep rows whose salted hash falls
    * below `rate · 2^60`. A pure narrow filter — no shuffle, no RNG state,
    * embarrassingly parallel at 100 TB, and the predicate sits directly on
    * top of the scan. */
  def bernoulli(
      df: DataFrame,
      keyCol: String,
      rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(hashKey(col(keyCol), salt) < lit(rateThreshold(rate)))

  /** Mixture sampling: an independent Bernoulli rate PER STRATUM — how a
    * training run hits a target data mix (keep 100% of rare languages,
    * 10% of crawl boilerplate, …) in one shuffle-free pass. Strata absent
    * from `rates` are dropped (an explicit mix is a whitelist). The rate
    * map is tiny and inlined as a CASE chain — no join, and the whole
    * predicate sits on the scan. Same salted hash as `bernoulli`, so
    * membership stays coordinated across tables and nested across rates:
    * raising one stratum's rate only ADDS rows. */
  def mixture(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      rates: Map[String, Double],
      salt: String = "graft"): DataFrame = {
    require(rates.nonEmpty, "mixture requires at least one stratum rate")
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(-1L)) { case (els, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(rateThreshold(rate))).otherwise(els)
      }
    df.filter(hashKey(col(keyCol), salt) < threshold)
  }

  /** Deterministic train/val/test split: the salted hash partitions the
    * key space into [0, t_train) → "train", [t_train, t_val) → "val",
    * rest → "test", with t_* the exact `rateThreshold` longs. Zero
    * shuffle (a pure filter-free projection on the scan), reproducible on
    * any engine from the md5 fragment alone, and stable under data growth:
    * a row's split never changes when other rows are added — the property
    * that keeps eval sets eval across corpus versions. */
  def trainValTest(
      df: DataFrame,
      keyCol: String,
      trainFrac: Double = 0.8,
      valFrac: Double = 0.1,
      salt: String = "graft"): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      s"fractions must satisfy 0 < train, 0 <= val, train + val < 1: $trainFrac/$valFrac")
    val h = hashKey(col(keyCol), salt)
    // a NULL key hashes to NULL, and the bare otherwise() would dump every
    // unkeyed row into "test" — polluting the eval set with exactly the
    // rows bernoulli/mixture silently DROP for the same key. Null keys get
    // a null split: visible, and consistent with the rest of the family.
    df.withColumn("split",
      when(h.isNull, lit(null).cast("string"))
        .when(h < lit(rateThreshold(trainFrac)), "train")
        .when(h < lit(rateThreshold(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** Exact per-stratum quota: the `n` rows with the smallest salted hash
    * in each stratum (ties broken by key), as a deterministic stand-in for
    * "n uniformly at random per group". Adds `sample_rank` (1-based).
    *
    * One shuffle on the stratum key; the per-stratum sort is the cost. At
    * 100 TB pre-thin with `bernoulli` first (membership is hash-ordered,
    * so any Bernoulli prefilter at rate r keeps the true top-n intact as
    * long as ~n survivors remain per stratum — pick r ≫ n/|stratum|):
    * the window then sorts only the survivors. */
  def stratifiedQuota(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      n: Int,
      salt: String = "graft"): DataFrame = {
    require(n > 0, s"quota must be positive: $n")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", hashKey(col(keyCol), salt))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
      .drop("__h")
  }

  /** Deterministic epoch resampling — the data-MIXING op (up/down-weight
    * domains by repetition, "epochs ∝ weight"): each row of stratum s is
    * emitted ⌊w_s⌋ times, plus once more iff its salted hash falls below
    * frac(w_s)·2^60. Expected copies per row = w_s EXACTLY, and the same
    * rows get the extra epoch on every run and engine (no RNG state; the
    * q80 oracle replays the hash). w = 0 drops the stratum; strata not in
    * `weights` get `defaultWeight`. Output adds `epoch` (0-based copy
    * index).
    *
    * Pure narrow explode — no shuffle; at 100 TB the duplication is read
    * amplification at training time, never a storage rewrite. */
  def epochResample(
      df: DataFrame,
      weights: Map[String, Double],
      stratumCol: String,
      keyCol: String,
      defaultWeight: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    (weights.values ++ Seq(defaultWeight)).foreach(w =>
      require(w >= 0.0 && w <= 64.0, s"weight out of [0, 64]: $w"))
    def whole(w: Double): Long = math.floor(w).toLong
    def fracThr(w: Double): Long = rateThreshold(w - math.floor(w))
    // weights are a tiny driver-side map ⇒ compile them into literal CASE
    // chains (codegen'd; no join, no broadcast table)
    val baseCol = weights.foldLeft(lit(whole(defaultWeight))) {
      case (acc, (k, w)) => when(col(stratumCol) === lit(k), lit(whole(w))).otherwise(acc)
    }
    val thrCol = weights.foldLeft(lit(fracThr(defaultWeight))) {
      case (acc, (k, w)) => when(col(stratumCol) === lit(k), lit(fracThr(w))).otherwise(acc)
    }
    df.withColumn("__reps",
        baseCol + when(hashKey(col(keyCol), salt) < thrCol, lit(1L)).otherwise(lit(0L)))
      .filter(col("__reps") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__reps") - 1)))
      .drop("__reps")
  }

  /** Weighted sampling without replacement via integer PRIORITY sampling
    * (Duffield, Lund & Thorup 2007: assign each row the priority
    * u_i / w_i for uniform u_i and keep the n smallest — selection
    * probability rises with weight): here `priority = h div w` with the
    * portable 60-bit hash as u, so the whole draw is exact-integer,
    * reproducible, and engine-replayable (no RNG, no float division).
    * How a curation pipeline takes a fixed-size sample biased toward
    * long/high-quality documents without a full sort by random():
    * the n smallest priorities are a TakeOrderedAndProject (per-partition
    * heaps, no global sort), and the (priority, key) order key is unique,
    * so the cut is deterministic. Rows with non-positive weight are
    * excluded (zero weight = never sampled).
    *
    * Weights must be an EXACT-arithmetic column — integral or DECIMAL
    * (the priority is `h div w` floor division, exact on both, the
    * property that makes the draw engine-replayable); a double-valued
    * score should be pre-scaled by the caller (e.g.
    * `(quality * 1000).cast("long")` or a decimal cast) — rejected here
    * with a clear error rather than failing analysis deep inside the
    * plan. The hash/weight expressions are built from the Column API over
    * fixed internal names, so no user identifier or salt is ever
    * interpolated into SQL text. */
  def weightedSample(
      df: DataFrame,
      weightCol: String,
      keyCol: String,
      n: Int,
      salt: String = "graft"): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    // resolve the field like the analyzer does (case-insensitive under the
    // default spark.sql.caseSensitive=false) — col(weightCol) downstream
    // accepts a case-mismatched name, so the type guard must too
    val wt = df.schema.fields.find(_.name.equalsIgnoreCase(weightCol)).map(_.dataType)
      .getOrElse(df.schema(weightCol).dataType) // truly missing: the stock loud error
    val exactArithmetic = wt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType                                => true
      case _                                             => false
    }
    require(exactArithmetic,
      s"weightCol '$weightCol' must be integral or decimal for exact priority division, " +
        s"got $wt (pre-scale a double score, e.g. (w * 1000).cast(\"long\"))")
    // decimals stay decimal — casting to long would silently truncate the
    // fraction; `div` (integral divide) is exact on both representations
    val wCol = wt match {
      case _: DecimalType => col(weightCol)
      case _              => col(weightCol).cast("long")
    }
    // guard the integral divide for fractional decimal weights: with
    // w < 0.125 the quotient h div w can exceed Long range (h < 2⁶⁰, so
    // 0.125 is the exact safe bound) — under ANSI that's a job-killing
    // ARITHMETIC_OVERFLOW, and with ANSI off the NULL priorities sort
    // FIRST and fill the sample with arbitrary rows. Such rows get the
    // sentinel WORST priority instead (they were the least likely picks
    // by construction: tiny weight ⇒ huge priority), tie-broken by key.
    val priority = wt match {
      case _: DecimalType =>
        when(col("__gft_w") >= lit(0.125), expr("__gft_h div __gft_w"))
          .otherwise(lit(Long.MaxValue))
      case _ => expr("__gft_h div __gft_w")
    }
    df.filter(col(weightCol) > 0)
      .withColumn("__gft_h", hashKey(col(keyCol), salt))
      .withColumn("__gft_w", wCol)
      .withColumn("priority", priority)
      .drop("__gft_h", "__gft_w")
      .orderBy(col("priority"), col(keyCol))
      .limit(n)
  }

  /** Deterministic global corpus shuffle into training shards — the last
    * step before a training run: every row gets a `shard` (uniform via the
    * salted 60-bit hash) and a dense 1-based `pos` inside its shard
    * (hash order, key tie-break), so shard files are reproducible
    * byte-for-byte across runs AND engines, yet uncorrelated with the
    * input order (the whole point: parquet files arrive clustered by
    * source/date, and a model must not see them that way).
    *
    * Scale shape: ONE hash-partition exchange on `shard` + a per-shard
    * sort for `row_number` — the same cost as the `repartition(n).
    * sortWithinPartitions` idiom, but with a portable deterministic order
    * instead of Spark's round-robin (which depends on task layout). Each
    * shard is a partition: pick `numShards` so a shard's rows fit an
    * executor (100 TB / 10k shards = 10 GB — right-sized for a sort
    * spill-free or near it). Changing `salt` reshuffles every epoch. */
  def shardShuffle(
      df: DataFrame,
      keyCol: String,
      numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", hashKey(col(keyCol), salt))
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
