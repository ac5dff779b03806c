package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.Compaction

/** Compaction invariants: rows are untouched, the file sprawl collapses
  * to the record bound, and re-compacting is a content no-op.
  */
class CompactionSpec extends SparkSuite {

  private def parquetFiles(dir: java.io.File): Map[String, Int] =
    dir.listFiles().filter(_.getName.startsWith("p_date="))
      .map(p => p.getName ->
        p.listFiles().count(_.getName.endsWith(".parquet"))).toMap

  test("compaction collapses fragmented partitions without changing a row") {
    val root = graft.util.Scratch.dir("compact_spec")
    val path = root.resolve("rates").toString
    val rates = Tables.rates(spark, sf("sf0.001"))
    rates.repartition(6)
      .withColumn("p_date", to_date(col("date")))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)

    val before = parquetFiles(new java.io.File(path))
    assert(before.values.exists(_ > 1)) // genuinely fragmented

    val content = spark.read.parquet(path).drop("p_date")
      .collect().map(_.toSeq).toSet
    val n = Compaction.compactDatePartitioned(spark, path)
    assert(n == rates.count())

    val after = parquetFiles(new java.io.File(path))
    assert(after.keySet == before.keySet)        // same partitions
    assert(after.values.forall(_ == 1))          // one file per day now
    assert(spark.read.parquet(path).drop("p_date")
      .collect().map(_.toSeq).toSet == content)  // row identity

    // a partition larger than the record bound splits instead of
    // producing one giant file
    Compaction.compactDatePartitioned(spark, path, maxRecordsPerFile = 10L)
    val bounded = parquetFiles(new java.io.File(path))
    val rowsPerDay = spark.read.parquet(path)
      .groupBy("p_date").count().collect()
      .map(r => s"p_date=${r.get(0)}" -> r.getLong(1)).toMap
    bounded.foreach { case (day, files) =>
      assert(files == math.ceil(rowsPerDay(day) / 10.0).toInt)
    }
    assert(spark.read.parquet(path).drop("p_date")
      .collect().map(_.toSeq).toSet == content)
  }

  test("a day far over the record bound is written by many parallel tasks") {
    // the straggler check: with maxRecordsPerFile=50, a 600-row day must
    // shuffle onto >1 writer task (previously repartition(p_date) pinned
    // the whole day onto ONE task that wrote all its files serially)
    val df = spark.range(600)
      .withColumn("p_date", to_date(lit("2024-03-01")))
      .withColumn("payload", col("id") * 2)
    val sharded = Compaction.shardByDay(df, maxRecordsPerFile = 50L)
    // AQE coalesces these KB-sized test partitions into one (at real
    // scale each ~maxRecordsPerFile shard is far above the advisory
    // size and stays its own task) — switch coalescing off to observe
    // the distribution the plan actually declares
    val tasksForDay = try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      sharded
        .select(org.apache.spark.sql.functions.spark_partition_id().as("tid"))
        .distinct().count()
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert(tasksForDay > 1, s"hot day written by $tasksForDay task(s)")
    // sharding is a pure reshuffle: row identity holds
    assert(sharded.select("id", "payload").collect().map(_.toSeq).toSet ==
      df.select("id", "payload").collect().map(_.toSeq).toSet)
  }
}
