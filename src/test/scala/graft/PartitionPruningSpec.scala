package graft

import org.apache.spark.sql.functions._

import graft.ingest.PartitionedRates
import graft.model.Tables

/** The §7.2 layout claim, asserted on the plan: over the date-partitioned
  * rates table, the day-granular cutoff is a PARTITION filter (directory
  * pruning at planning time), and the pruned answer equals the
  * row-filtered formulation exactly.
  */
class PartitionPruningSpec extends SparkSuite {

  test("fx_partitioned_cutoff: cutoff predicate lands in PartitionFilters") {
    val df = PartitionedRates.cutoffStats(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"),
      s"expected a non-empty PartitionFilters on p_date in:\n$plan")
    // the cutoff must NOT survive as a post-scan row filter — day
    // granularity means pruning answers it completely
    assert(!plan.contains("PushedFilters: [IsNotNull(p_date"),
      "p_date must be a partition column, not a data column")
  }

  test("fx_dpp_days: dynamicpruning InSubquery lands in the fact scan") {
    val df = PartitionedRates.dppDayStats(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning expression in PartitionFilters of:\n$plan")
    // and the answer equals the row-filtered formulation
    val viaDpp = df.collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val plain = graft.model.Tables.rates(spark, sf("sf0.001"))
      .where(org.apache.spark.sql.functions.dayofmonth(col("date")) <= 3)
      .groupBy(col("date"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max(col("rate")).as("mx"))
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(viaDpp == plain)
  }

  test("q_agg_pushdown: COUNT/MIN/MAX answered from parquet footers") {
    val df = SparkEntry.queries("q_agg_pushdown")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"expected footer-level aggregate pushdown in:\n$plan")
    assert(plan.contains("MIN(l_orderkey)") && plan.contains("MAX(l_extendedprice)"),
      s"expected MIN/MAX pushed in:\n$plan")
    // and the footer answer equals the full-scan answer
    val full = Tables.lineitem(spark, sf("sf0.001"))
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")),
        max(col("l_extendedprice")))
      .collect().head
    assert(df.collect().head == full)
  }

  test("q_runtime_filter: bloom filter from the dim filter prunes the fact scan") {
    val df = SparkEntry.queries("q_runtime_filter")(spark, sf("sf0.001"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"expected an injected runtime bloom filter in:\n$optimized")
    // and pruning is result-neutral vs the plain session's join
    val plain = Tables.lineitem(spark, sf("sf0.001"))
      .join(Tables.orders(spark, sf("sf0.001"))
        .where(col("o_totalprice") > lit(475000.0)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == plain)
  }

  test("AQE splits a skewed shuffle-join partition (OptimizeSkewedJoin fires)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // one hot key with ~50k padded rows vs 100 singleton keys
    val fact = ((0 until 50000).map(i => (0L, s"pad-$i-${"x" * 50}")) ++
      (1L to 100L).map(k => (k, "tiny"))).toDF("k", "payload")
    val dim = (0L to 100L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val joined = fact.join(dim, "k")
    // execute THIS QueryExecution (count() would plan a different one
    // and leave joined's own AQE plan unfinalized)
    assert(joined.collect().length == 50100)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected OptimizeSkewedJoin to mark the join skewed in:\n$finalPlan")
  }

  test("pruned cutoff stats equal the row-filtered formulation") {
    val pruned = PartitionedRates.cutoffStats(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSet
    val rowFiltered = Tables.rates(spark, sf("sf0.001"))
      .where(col("date") <= lit("2024-01-20").cast("date"))
      .groupBy(col("ccy_couple"))
      .agg(count(lit(1)).as("n_ticks"),
        max(col("rate")).as("max_rate"),
        max(col("event_time")).as("max_event_time"))
      .collect().map(_.toSeq).toSet
    assert(pruned == rowFiltered)
  }

  test("scan reads strictly fewer partitions than exist (pruning fires)") {
    val path = PartitionedRates.partitionedPath(spark, sf("sf0.001"))
    val all = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("p_date="))
    // the synthetic window spans ~30 days; the cutoff keeps days <= Jan 20
    val kept = spark.read.parquet(path)
      .where(col("p_date") <= lit("2024-01-20").cast("date"))
      .select(col("p_date")).distinct().count()
    assert(kept < all, s"cutoff kept $kept of $all partitions — nothing pruned")
  }
}
