package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality gate: every rule's violation count computed in
  * ONE aggregate over the data (a conditional sum per rule), not one scan
  * per rule — at 100 TB the difference between a DQ gate and a DQ outage.
  */
object DataQuality {

  final case class Rule(name: String, holds: Column)

  /** One row: total row count plus a violation count per rule. */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      rules.map(r =>
        sum(when(!coalesce(r.holds, lit(false)), 1L).otherwise(0L))
          .as(s"viol_${r.name}")): _*)

  /** The WRITE-PATH form of [[profile]]: the same single-pass rule
    * counters collected while the data flows to its sink via
    * `Dataset.observe` (Catalyst `CollectMetrics`) — zero extra scans,
    * zero extra shuffles; the metrics ride the already-running job as
    * accumulators. This is how a production pipeline gates a 100 TB
    * write: profile() afterwards would pay a second full read; observe()
    * is free. Returns the observed metrics as a 1-row DataFrame after
    * running `action` on the instrumented frame (in production: the
    * parquet write of the instrumented frame itself — the noop-format
    * write the gate query uses is that shape without the bytes).
    */
  def observedProfile(df: DataFrame, rules: Seq[Rule])
      (action: DataFrame => Unit): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    val metricCols =
      count(lit(1)).as("n_rows") +:
        rules.map(r =>
          sum(when(!coalesce(r.holds, lit(false)), 1L).otherwise(0L))
            .as(s"viol_${r.name}"))
    val instrumented = df.observe(obs, metricCols.head, metricCols.tail: _*)
    action(instrumented)
    val row = obs.get
    val names = "n_rows" +: rules.map(r => s"viol_${r.name}")
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row.fromSeq(
        names.map(n => row(n).asInstanceOf[Long]))),
      org.apache.spark.sql.types.StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Throws with a per-rule breakdown when any rule is violated. */
  def assertAll(df: DataFrame, rules: Seq[Rule]): Unit = {
    val row = profile(df, rules).collect().head
    val bad = rules.zipWithIndex
      .map { case (r, i) => r.name -> row.getLong(i + 1) }
      .filter(_._2 > 0)
    require(bad.isEmpty,
      s"data-quality violations: ${bad.map { case (n, c) => s"$n=$c" }.mkString(", ")}")
  }

  /** A declarative data contract over one table: row-level predicates,
    * column completeness, key uniqueness, and foreign-key containment,
    * validated into ONE report frame (`check_name`, `n_rows`, `n_good`,
    * `metric`, `passed`). The Deequ-shaped surface the reference's ad-hoc
    * sanity checks (row-count prints after each MySQL write,
    * update_exchange_rates.py:199-204) grow into at warehouse scale.
    *
    * Execution shape at 100 TB: every row-level conjunct (completeness +
    * predicate rules) folds into a SINGLE aggregate pass; each uniqueness
    * check adds one exact count-distinct inside that same pass (Catalyst
    * plans the expand + two-level agg — still one scan); each FK check is
    * one anti-join counted on the child (broadcast when the parent digest
    * is small, shuffle-on-key otherwise — Catalyst/AQE decide). Metrics
    * are ratios of exact longs, so the doubles are engine-identical.
    */
  sealed trait Constraint { def name: String; def atLeast: Double }
  /** Fraction of rows with `column` non-null must reach `atLeast`. */
  final case class Complete(name: String, column: String,
      atLeast: Double = 1.0) extends Constraint
  /** Fraction of rows satisfying `holds` must reach `atLeast`. A row
    * where the predicate evaluates NULL counts as failing (SQL CHECK
    * semantics would pass it; a DQ gate must flag it).
    */
  final case class Satisfies(name: String, holds: Column,
      atLeast: Double = 1.0) extends Constraint
  /** distinct(columns) / count(*) must reach `atLeast` (1.0 = key). */
  final case class Unique(name: String, columns: Seq[String],
      atLeast: Double = 1.0) extends Constraint
  /** Fraction of child rows whose `column` appears in `parent.parentCol`
    * must reach `atLeast` (referential integrity; NULL child keys are
    * orphans — a DQ gate counts them against the contract).
    */
  final case class SubsetOf(name: String, column: String,
      parent: DataFrame, parentCol: String,
      atLeast: Double = 1.0) extends Constraint

  /** Validate a contract: one report row per constraint, constraint
    * order preserved. All row-level constraints share one scan; each
    * [[SubsetOf]] adds one anti-join job on the child table.
    */
  def validate(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    // one aggregate pass: n_rows + a good-count per row-level constraint
    val rowLevel: Seq[(Constraint, Column)] = constraints.collect {
      case c: Complete  => c -> sum(when(col(c.column).isNotNull, 1L).otherwise(0L))
      case c: Satisfies => c -> sum(when(coalesce(c.holds, lit(false)), 1L).otherwise(0L))
      // struct-wrapped so NULL-bearing tuples COUNT (a struct is never
      // null): matches the oracle's SELECT DISTINCT and the incremental
      // path's row-level distinct — multi-arg count_distinct would skip
      // any tuple with a null component and diverge on nullable keys
      case c: Unique    =>
        c -> count_distinct(struct(c.columns.map(col): _*))
    }
    val aggCols = count(lit(1)).as("n_rows") +:
      rowLevel.zipWithIndex.map { case ((_, g), i) => g.as(s"g$i") }
    val base = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    val nRows = base.getLong(0)
    val passCount: Map[String, Long] = rowLevel.zipWithIndex.map {
      case ((c, _), i) => c.name -> base.getLong(i + 1)
    }.toMap
    // FK checks: count child rows that survive a semi-join to the parent
    val fkCount: Map[String, Long] = constraints.collect {
      case c: SubsetOf =>
        val matched = df.where(col(c.column).isNotNull)
          .join(c.parent.select(col(c.parentCol).as(c.column)).distinct(),
            Seq(c.column), "left_semi")
          .count()
        c.name -> matched
    }.toMap
    reportFrom(df.sparkSession, constraints, nRows, passCount ++ fkCount)
  }

  /** Assemble the per-constraint report frame from counted goods — the
    * shared tail of the one-shot [[validate]] and the incrementally
    * maintained path (StreamReplay.replayConstraintsIncremental), which
    * MUST emit identical frames when their counts agree.
    */
  def reportFrom(spark: org.apache.spark.sql.SparkSession,
      constraints: Seq[Constraint], nRows: Long,
      good: Map[String, Long]): DataFrame = {
    val report = constraints.map { c =>
      val g = good(c.name)
      val metric = if (nRows == 0L) 1.0 else g.toDouble / nRows.toDouble
      org.apache.spark.sql.Row(c.name, nRows, g, metric, metric >= c.atLeast)
    }
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(report).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("check_name",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_good",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("metric",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("passed",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** Mergeable one-row PARTIAL counters for a micro-batch:
    * `n_rows` plus `g_<name>` per [[Complete]]/[[Satisfies]]/[[SubsetOf]]
    * — all exact longs, so per-batch partials SUM to the one-shot
    * counts (FK matches are additive because the parent is static and
    * each child row matches independently). [[Unique]] is deliberately
    * absent: distinct counts don't merge by addition — the incremental
    * path maintains the distinct KEY SET as idempotent-by-value state
    * instead (the KMV-partials argument, exact instead of sketched).
    * One aggregate job per batch; FK flags ride broadcast left joins of
    * the deduped parent keys, so the batch is scanned once.
    */
  def partialCounters(batch: DataFrame,
      constraints: Seq[Constraint]): DataFrame = {
    val fks = constraints.collect { case c: SubsetOf => c }
    val flagged = fks.zipWithIndex.foldLeft(batch) { case (df, (c, i)) =>
      df.join(
        broadcast(c.parent.select(col(c.parentCol).as(c.column)).distinct()
          .withColumn(s"__fk_$i", lit(1))),
        Seq(c.column), "left")
    }
    val goods: Seq[Column] = constraints.collect {
      case c: Complete =>
        sum(when(col(c.column).isNotNull, 1L).otherwise(0L)).as(s"g_${c.name}")
      case c: Satisfies =>
        sum(when(coalesce(c.holds, lit(false)), 1L).otherwise(0L)).as(s"g_${c.name}")
    } ++ fks.zipWithIndex.map { case (c, i) =>
      sum(when(col(s"__fk_$i").isNotNull, 1L).otherwise(0L)).as(s"g_${c.name}")
    }
    flagged.agg(count(lit(1)).as("n_rows"), goods: _*)
  }

  /** k-ANONYMITY audit (Sweeney 2002) — the governance check a dataset
    * passes before leaving its trust boundary: every combination of
    * quasi-identifier values must be shared by at least k rows, or the
    * rare combination re-identifies its subjects. Output: one row per
    * VIOLATING equivalence class (its quasi-identifier values and size)
    * plus the class count makes suppression actionable; an empty result
    * certifies k-anonymity. One map-side-combinable groupBy on the
    * quasi-identifier tuple — the same shape as exact dedup, scale-safe
    * at any corpus size; exact integer counts, trivially replayable.
    */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[String],
      k: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)

  /** FUNCTIONAL-DEPENDENCY check (the Metanome-style profiling
    * primitive): for each candidate `det → dep`, does every determinant
    * value map to exactly one dependent value? Reported per candidate
    * with the violating-key count — the evidence a schema-inference or
    * key-discovery pass runs on. NULL dependents count as a value
    * (two rows (k, NULL), (k, 1) violate). One map-side-combinable
    * groupBy per candidate on its determinant; exact integer counts.
    */
  def functionalDependencies(df: DataFrame,
      deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "need at least one candidate dependency")
    deps.map { case (det, dep) =>
      df.groupBy(col(det))
        .agg(countDistinct(struct(col(dep))).as("nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_keys"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** l-DIVERSITY audit (Machanavajjhala 2007) — k-anonymity's
    * complement: a class can be large yet still leak if every member
    * shares the same SENSITIVE value (homogeneity attack). Output: one
    * row per class whose sensitive attribute takes fewer than `l`
    * distinct values, with its size and diversity; empty certifies
    * l-diversity. Same map-side-combinable groupBy shape as
    * [[kAnonymityViolations]] with a distinct-count, scale-safe.
    */
  def lDiversityViolations(df: DataFrame, quasiIds: Seq[String],
      sensitive: Column, l: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))
      .where(col("l_distinct") < l)

  /** DISTRIBUTION-DRIFT monitor (the chi-square counterpart of the PSI
    * check an ML serving pipeline runs on every feature): the value
    * distribution of the CURRENT half of the time span tested against
    * the REFERENCE first half over fixed value buckets. Chi-square, not
    * PSI, deliberately — the statistic is pure rational arithmetic on
    * exact integer counts (PSI's ln() differs across libm
    * implementations in the last ulp), and the bucket terms fold in
    * BUCKET ORDER over the ≤`nBuckets`-element digest, so the double
    * accumulation order is fixed and the report is bit-reproducible.
    *
    * Scale shape: one map-side-combinable groupBy to the bucket digest
    * (≤ nBuckets rows whatever the corpus), a 1-row broadcast of the
    * span and totals, and a sorted in-row fold. Buckets present only in
    * the current window ("new buckets") are counted separately — a new
    * mode appearing is itself drift evidence chi-square can't price.
    */
  /** The (date, bucket, n) digest of a raw relation — shared by the
    * one-shot monitor and the incremental counter maintenance, which
    * must bucket identically or the maintained report diverges.
    */
  private def driftDaily(df: DataFrame, valueCol: String, tsCol: String,
      bucketWidth: Double, nBuckets: Int): DataFrame =
    df.select(to_date(col(tsCol)).as("date"),
        least(floor(col(valueCol) / bucketWidth), lit(nBuckets - 1))
          .cast("int").as("bucket"))
      .groupBy(col("date"), col("bucket")).agg(count(lit(1)).as("n"))

  def driftChi2(df: DataFrame, valueCol: String, tsCol: String,
      bucketWidth: Double = 50.0, nBuckets: Int = 20,
      threshold: Double = 30.14): DataFrame =
    driftFromDaily(driftDaily(df, valueCol, tsCol, bucketWidth, nBuckets),
      threshold)

  /** Batch half of INCREMENTAL drift maintenance: append this batch's
    * (date, bucket) partial counts — O(batch)/batch, LSM shape,
    * batchId-idempotent. The REFERENCE/CURRENT split is derived from
    * the maintained state at REPORT time (a new batch can extend the
    * span and move the midpoint), which is why the state is the daily
    * digest, not pre-split counters.
    */
  def appendDriftBatch(s: org.apache.spark.sql.SparkSession,
      countsDir: String, batch: DataFrame, valueCol: String, tsCol: String,
      bucketWidth: Double = 50.0, nBuckets: Int = 20,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      driftDaily(batch, valueCol, tsCol, bucketWidth, nBuckets),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the maintained daily digest and run the same
    * statistic — must equal the one-shot [[driftChi2]] bit for bit.
    */
  def driftChi2FromPartials(s: org.apache.spark.sql.SparkSession,
      countsDir: String, threshold: Double = 30.14): DataFrame =
    driftFromDaily(
      s.read.parquet(s"$countsDir/partials")
        .groupBy(col("date"), col("bucket")).agg(sum(col("n")).as("n")),
      threshold)

  /** TWO-PASS DISTRIBUTED PREFIX SUM over the distinct-value digest —
    * the warehouse-scale cumulative-CDF primitive shared by [[ksDrift]]
    * and [[cvmDrift]]. An unpartitioned `Window.orderBy(v)` would move
    * the whole digest (corpus-sized for a continuous column) into ONE
    * task; instead: (1) range-partition by `v` (equal values colocate;
    * partition order follows value order by RangePartitioner's
    * contract), compute in-partition running sums with a PARTITIONED
    * window; (2) aggregate per-partition totals (a partition-count-
    * bounded digest), turn them into exclusive prefix offsets with a
    * broadcast theta-join over that tiny frame, and broadcast the
    * offsets back onto the ranged digest. All-integer, so the result is
    * bit-identical to the single-task form regardless of where the
    * range boundaries fall. Input: (v, a, b); output adds cumulative
    * (ca, cb).
    */
  private def rangedCumCounts(g: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // partition count follows the session's shuffle parallelism: the
    // digest is corpus-sized for a continuous column, so a deployment
    // sizes this the same way it sizes every other shuffle
    val parts = g.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = g.repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
    val wIn = Window.partitionBy(col("pid")).orderBy(col("v"))
    val inPart = ranged
      .withColumn("ra", sum(col("a")).over(wIn))
      .withColumn("rb", sum(col("b")).over(wIn))
    val totals = ranged.groupBy(col("pid"))
      .agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    val prior = totals
      .select(col("pid").as("ppid"), col("ta"), col("tb"))
    val offsets = totals.select(col("pid"))
      .join(broadcast(prior), col("ppid") < col("pid"), "left")
      .groupBy(col("pid"))
      .agg(coalesce(sum(col("ta")), lit(0L)).as("oa"),
        coalesce(sum(col("tb")), lit(0L)).as("ob"))
    inPart.join(broadcast(offsets), Seq("pid"))
      .select(col("v"), col("a"), col("b"),
        (col("ra") + col("oa")).as("ca"),
        (col("rb") + col("ob")).as("cb"))
  }

  /** TWO-SAMPLE KOLMOGOROV-SMIRNOV drift test on the UNBINNED values —
    * the continuous sibling of [[driftChi2]] (binning hides
    * within-bucket shifts; KS prices the worst CDF gap at full value
    * resolution). Same reference/current split rule (first calendar
    * half vs rest). Exact integer core: at each distinct value,
    * D_num = |cumref·n_cur − cumcur·n_ref| (longs — no float CDFs
    * compared), KS D = max D_num / (n_ref·n_cur). The 5% flag uses the
    * squared two-sample threshold c(0.05)² = 1.358² = 1.844164:
    * D²·n_ref·n_cur/(n_ref+n_cur) > c² — sqrt-free. One grouped count
    * plus the [[rangedCumCounts]] two-pass distributed prefix sum over
    * the distinct-value digest — no single-task window anywhere.
    */
  def ksDrift(df: DataFrame, valueCol: String, tsCol: String): DataFrame =
    ksFromDaily(valueDaily(df, valueCol, tsCol))

  /** Report half of incremental KS maintenance: the SAME maintained
    * (d, v, n) digest the CvM family folds ([[appendValueCountBatch]])
    * answers the KS question too — one state, both statistics. Must
    * equal the one-shot [[ksDrift]] bit for bit.
    */
  def ksDriftFromPartials(s: org.apache.spark.sql.SparkSession,
      countsDir: String): DataFrame =
    ksFromDaily(
      s.read.parquet(s"$countsDir/partials")
        .groupBy(col("d"), col("v")).agg(sum(col("n")).as("n")))

  private def ksFromDaily(daily: DataFrame): DataFrame = {
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val m = daily.crossJoin(broadcast(span))
      .select(col("v"), col("n"),
        (col("d") < date_add(col("d0"),
          (datediff(col("d1"), col("d0")) / 2).cast("int"))).as("is_ref"))
    val g = m.groupBy(col("v")).agg(
      sum(when(col("is_ref"), col("n")).otherwise(0L)).as("a"),
      sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("b"))
    val tot = g.agg(sum(col("a")).as("n_ref"), sum(col("b")).as("n_cur"))
    val w = rangedCumCounts(g)
      .crossJoin(broadcast(tot))
      .select(abs(col("ca") * col("n_cur") - col("cb") * col("n_ref"))
        .as("dn"))
    val ks = col("d_num").cast("double") /
      (col("n_ref").cast("double") * col("n_cur").cast("double"))
    w.agg(max(col("dn")).as("d_num")).crossJoin(broadcast(tot))
      .select(col("n_ref"), col("n_cur"), col("d_num"), ks.as("ks_d"))
      .withColumn("ks_stat", col("ks_d") * col("ks_d")
        * ((col("n_ref") * col("n_cur")).cast("double")
          / (col("n_ref") + col("n_cur")).cast("double")))
      .withColumn("drift_5pct", col("ks_stat") > 1.844164)
  }

  /** The POSITIVE exemplar for the KS gate (the Benford-conforming /
    * secret-scan-taint precedent: the synthetic corpus is stationary,
    * so the alarm arm needs a constructed drift): the current half's
    * values shift by a constant before the same test runs — the flag
    * must fire. x + 0.0 = x in IEEE, so the reference half is
    * bit-untouched.
    */
  def ksDriftShifted(df: DataFrame, valueCol: String, tsCol: String,
      shift: Double = 20.0): DataFrame = {
    val s0 = df.select(col(valueCol).as("v0"),
      to_date(col(tsCol)).as("d"), col(tsCol).as("ts"))
    val span = s0.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val shifted = s0.crossJoin(broadcast(span))
      .select((col("v0") + when(col("d") < date_add(col("d0"),
          (datediff(col("d1"), col("d0")) / 2).cast("int")), 0.0)
        .otherwise(shift)).as("value"), col("ts"))
    ksDrift(shifted, "value", "ts")
  }

  /** TWO-SAMPLE CRAMÉR–VON MISES drift test — the whole-CDF sibling of
    * [[ksDrift]] (Anderson 1962, "On the distribution of the two-sample
    * Cramér–von Mises criterion"; public method): where KS prices only
    * the WORST CDF gap, CvM integrates the squared gap over every
    * sample point, so many small persistent shifts that KS under-prices
    * accumulate. Same reference/current split (first calendar half vs
    * rest), same distinct-value prefix-sum digest — one extra squared
    * term per distinct value.
    *
    * Exact integer core: at each distinct value v with multiplicity
    * w = a+b, d = ca·n_cur − cb·n_ref (long — the KS numerator before
    * the abs), and S = Σ w·d² accumulated in DECIMAL(38,0) (d² alone
    * can pass 2^63; the decimal fold is associative-exact, HUGEINT on
    * the oracle side). T = S / (N²·n_ref·n_cur) with N = n_ref+n_cur —
    * the integral form T = (nm/N²)·Σ_k [F_n(x_k) − G_m(x_k)]² over all
    * N sample points. S crosses 2^53, so it converts through the
    * STRING path on both engines (the fx_higher_moments ULP rule); the
    * denominator is the same left-associated double product in both.
    * The 5% flag uses the asymptotic critical value T > 0.461.
    * Range bound: S ≤ N·(n·m)² ≲ N⁵/16 and the Σ stays inside
    * DECIMAL(38,0) to N ≈ 3·10⁶ rows; past that, run the same digest
    * on a per-day stratified sample or rescale d by a power of two
    * before squaring — the plan shape is unchanged.
    */
  def cvmDrift(df: DataFrame, valueCol: String, tsCol: String): DataFrame =
    cvmFromDaily(valueDaily(df, valueCol, tsCol))

  /** The (d, v, n) daily distinct-value digest — shared by the one-shot
    * KS and CvM tests and the incremental counter maintenance, which
    * must count identically or the maintained reports diverge.
    * O(distinct values per day) rows; counts are additive, so per-batch
    * partials fold.
    */
  private def valueDaily(df: DataFrame, valueCol: String,
      tsCol: String): DataFrame =
    df.select(col(valueCol).as("v"), to_date(col(tsCol)).as("d"))
      .groupBy(col("d"), col("v")).agg(count(lit(1)).as("n"))

  /** Batch half of INCREMENTAL CDF-drift maintenance (the
    * [[appendDriftBatch]] shape at value resolution): append this
    * batch's (d, v, n) partial counts — O(batch distinct)/batch, LSM
    * shape, batchId-idempotent. ONE maintained state serves BOTH
    * whole-CDF statistics ([[ksDriftFromPartials]] and
    * [[cvmDriftFromPartials]]). The REFERENCE/CURRENT split derives
    * from the maintained span at REPORT time, so late batches that
    * move the midpoint are handled by construction.
    */
  def appendValueCountBatch(s: org.apache.spark.sql.SparkSession,
      countsDir: String, batch: DataFrame, valueCol: String, tsCol: String,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(valueDaily(batch, valueCol, tsCol),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the maintained daily digest and run the same
    * statistic — must equal the one-shot [[cvmDrift]] bit for bit
    * (counts are additive integers, so the fold is exact whatever the
    * batching).
    */
  def cvmDriftFromPartials(s: org.apache.spark.sql.SparkSession,
      countsDir: String): DataFrame =
    cvmFromDaily(
      s.read.parquet(s"$countsDir/partials")
        .groupBy(col("d"), col("v")).agg(sum(col("n")).as("n")))

  private def cvmFromDaily(daily: DataFrame): DataFrame = {
    val span = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val m = daily.crossJoin(broadcast(span))
      .select(col("v"), col("n"),
        (col("d") < date_add(col("d0"),
          (datediff(col("d1"), col("d0")) / 2).cast("int"))).as("is_ref"))
    val g = m.groupBy(col("v")).agg(
      sum(when(col("is_ref"), col("n")).otherwise(0L)).as("a"),
      sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("b"))
    val tot = g.agg(sum(col("a")).as("n_ref"), sum(col("b")).as("n_cur"))
    val w = rangedCumCounts(g)
      .crossJoin(broadcast(tot))
      .select((col("a") + col("b")).as("w"),
        (col("ca") * col("n_cur") - col("cb") * col("n_ref")).as("dn"))
    val sNum = w.agg(sum(col("w").cast("decimal(38,0)")
        * col("dn").cast("decimal(38,0)") * col("dn").cast("decimal(38,0)"))
      .cast("decimal(38,0)").as("s_num"))
    val nTot = (col("n_ref") + col("n_cur")).cast("double")
    val denom = nTot * nTot * col("n_ref").cast("double") *
      col("n_cur").cast("double")
    sNum.crossJoin(broadcast(tot))
      .select(col("n_ref"), col("n_cur"),
        col("s_num").cast("string").as("s_num"),
        (col("s_num").cast("string").cast("double") / denom).as("cvm_t"))
      .withColumn("drift_5pct", col("cvm_t") > 0.461)
  }

  /** The alarm arm ([[ksDriftShifted]] precedent): the current half
    * shifts by a constant before the same test runs; x + 0.0 = x keeps
    * the reference half bit-untouched and the flag must fire.
    */
  def cvmDriftShifted(df: DataFrame, valueCol: String, tsCol: String,
      shift: Double = 20.0): DataFrame = {
    val s0 = df.select(col(valueCol).as("v0"),
      to_date(col(tsCol)).as("d"), col(tsCol).as("ts"))
    val span = s0.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val shifted = s0.crossJoin(broadcast(span))
      .select((col("v0") + when(col("d") < date_add(col("d0"),
          (datediff(col("d1"), col("d0")) / 2).cast("int")), 0.0)
        .otherwise(shift)).as("value"), col("ts"))
    cvmDrift(shifted, "value", "ts")
  }

  private def driftFromDaily(daily: DataFrame,
      threshold: Double): DataFrame = {
    val span = daily.agg(min(col("date")).as("d0"), max(col("date")).as("d1"))
    val b = daily.crossJoin(broadcast(span))
      .select(col("bucket"), col("n"),
        (col("date") <
          date_add(col("d0"), (datediff(col("d1"), col("d0")) / 2)
            .cast("int"))).as("is_ref"))
    val counts = b.groupBy(col("bucket")).agg(
      sum(when(col("is_ref"), col("n")).otherwise(0L)).as("refc"),
      sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("curc"))
    val tot = counts.agg(sum(col("refc")).as("n_ref"),
      sum(col("curc")).as("n_cur"))
    val withTot = counts.crossJoin(broadcast(tot))
    val e = col("n_cur").cast("double") * col("refc").cast("double") /
      col("n_ref").cast("double")
    val term = coalesce(
      (col("curc").cast("double") - e) * (col("curc").cast("double") - e)
        / nullif(e, lit(0.0)),
      lit(0.0))
    val digest = withTot
      .select(col("bucket"), col("refc"), col("curc"),
        col("n_ref"), col("n_cur"), term.as("term"))
      .groupBy(col("n_ref"), col("n_cur"))
      .agg(
        sum(when(col("refc") > 0, 1L).otherwise(0L)).as("n_buckets"),
        sum(when(col("refc") === 0 && col("curc") > 0, 1L).otherwise(0L))
          .as("n_new_buckets"),
        collect_list(when(col("refc") > 0,
          struct(col("bucket"), col("term")))).as("terms"))
    digest.select(col("n_ref"), col("n_cur"), col("n_buckets"),
      col("n_new_buckets"),
      round(aggregate(
        transform(array_sort(col("terms")), x => x.getField("term")),
        lit(0.0), (acc, x) => acc + x), 6).as("chi2"))
      .withColumn("drift",
        col("chi2") > threshold || col("n_new_buckets") > 0)
  }

  /** Key-skew diagnostic — the numbers that decide whether a join/agg on
    * `keyCol` needs salting, AQE skew handling, or nothing: total rows,
    * distinct keys, the heaviest key's row count and share, the p99 key
    * size, and the max/mean skew factor. One groupBy to the per-key
    * count digest (map-side combinable), then a 1-row aggregate over
    * |keys| rows — the profile costs one shuffle however large the
    * corpus. Counts are exact longs; the three derived ratios are single
    * double divisions on identical operands.
    */
  /** BENFORD first-digit audit (Newcomb 1881 / Benford 1938): real-world
    * multiplicative amounts lead with digit d at frequency log10(1+1/d);
    * fabricated or truncated data doesn't — the classic forensic screen
    * an amounts column gets before anyone trusts it. One row per digit:
    * exact observed count, the Benford expectation n·p_d, and the
    * chi-square contribution (obs − n·p_d)²/(n·p_d).
    *
    * Determinism: the first digit comes from the decimal's string form
    * (exact — no float log10 at runtime); the nine p_d constants are
    * hardcoded double literals the oracle repeats verbatim, so the
    * expectation/contribution trees are operand-identical. Scale: one
    * map-side-combinable 9-group aggregate + a broadcast 1-row total —
    * one shuffle of nine rows regardless of corpus size.
    */
  def benfordDigits(df: DataFrame, amountCol: String): DataFrame = {
    val obs = df
      .select(substring(col(amountCol).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .where(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(sum(col("n_obs")).as("n_total"))
    val p = when(col("digit") === 1, lit(0.3010299956639812))
      .when(col("digit") === 2, lit(0.17609125905568124))
      .when(col("digit") === 3, lit(0.12493873660829992))
      .when(col("digit") === 4, lit(0.09691001300805642))
      .when(col("digit") === 5, lit(0.07918124604762482))
      .when(col("digit") === 6, lit(0.06694678963061322))
      .when(col("digit") === 7, lit(0.05799194697768673))
      .when(col("digit") === 8, lit(0.05115252244738129))
      .otherwise(lit(0.04575749056067514))
    val expected = col("n_total").cast("double") * p
    val dev = col("n_obs").cast("double") - expected
    obs.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"), expected.as("expected"),
        (dev * dev / expected).as("chi2_term"))
  }

  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_key_rows"),
      percentile(col("c"), lit(0.99)).as("p99_key_rows"))
    .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
      col("p99_key_rows"),
      (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
        .as("top_key_share"),
      (col("max_key_rows").cast("double")
        / (col("n_rows").cast("double") / col("n_keys").cast("double")))
        .as("skew_factor"))
  }

  /** VOLUME anomaly monitor — the "did yesterday's load shrink?" check
    * a warehouse runs on every ingested table: per-day row counts, each
    * day z-scored against its TRAILING `window`-day baseline (current
    * day excluded, so an anomalous day cannot mask itself). The
    * Bollinger determinism recipe: counts are exact longs, the frame
    * reduces to exact integer moments (n, Σ, Σ²), and only the final z
    * tree runs in doubles — identical expression tree in the oracle.
    * Days with fewer than 2 baseline days emit NULL (an undefined
    * baseline never alarms); a ZERO-VARIANCE baseline alarms on ANY
    * deviation from its mean (z is undefined there, but a spike over a
    * perfectly steady history is the clearest anomaly, not a blind
    * spot). Scale shape: the corpus reduces to the |days|-row digest in
    * one map-side-combinable groupBy; the window runs on the digest.
    */
  def volumeAnomaly(df: DataFrame, tsCol: String, window: Int = 7,
      zThreshold: Double = 3.0): DataFrame =
    volumeAnomalyFromDaily(
      df.groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("n_rows")),
      window, zThreshold)

  /** The digest→report half of [[volumeAnomaly]]: takes the per-day
    * (day, n_rows) count digest — however it was maintained (one-shot
    * groupBy or incrementally folded batch counters) — and computes the
    * z-scored report. Separated so the incremental path converges to
    * the one-shot by construction.
    */
  def volumeAnomalyFromDaily(daily: DataFrame, window: Int = 7,
      zThreshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("day")).rowsBetween(-window, -1)
    val moments = daily
      .withColumn("n_l", count(lit(1)).over(w))
      .withColumn("s_l", sum(col("n_rows")).over(w))
      .withColumn("ss_l", sum(col("n_rows") * col("n_rows")).over(w))
    val n = col("n_l").cast("double")
    val s = col("s_l").cast("double")
    val ss = col("ss_l").cast("double")
    val mean = s / n
    val sd = sqrt(greatest(n * ss - s * s, lit(0.0))
      / nullif(n * (n - lit(1.0)), lit(0.0)))
    val z = (col("n_rows").cast("double") - mean) / nullif(sd, lit(0.0))
    val isAnom = when(col("n_l") >= 2,
      (sd === lit(0.0) && col("n_rows").cast("double") =!= mean) ||
        (sd > lit(0.0) && abs(z) > lit(zThreshold)))
    moments.select(col("day"), col("n_rows"),
      mean.as("baseline_mean"), z.as("z_score"), isAnom.as("is_anomaly"))
  }
}
