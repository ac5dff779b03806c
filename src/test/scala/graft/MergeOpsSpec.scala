package graft

import org.apache.spark.sql.functions._

import graft.fixtures.RateFixtures
import graft.ingest.MergeOps

class MergeOpsSpec extends SparkSuite {

  private def fixture = RateFixtures.exchangeRates(spark)
  private val keys = Seq("ccy_couple", "date")
  private def ordering = Seq(col("timestamp"), col("event_id"))

  test("upsertLatest keeps one row per key, last writer wins") {
    val up = MergeOps.upsertLatest(fixture, keys, ordering)
    assert(up.count() == 10) // 11 rows, one duplicate (EUR/USD, Jan16)
    val eur16 = up.where(col("ccy_couple") === "EUR/USD" &&
      col("date") === to_timestamp(lit("2024-01-16"))).collect().head
    assert(eur16.getDecimal(3).doubleValue() == 1.16)
  }

  test("merge is idempotent: re-ingesting the same payload is a no-op") {
    val base = MergeOps.upsertLatest(fixture, keys, ordering)
    val again = MergeOps.merge(base, base, keys, ordering)
    assert(again.count() == base.count())
    assert(again.collect().map(_.toSeq).toSet == base.collect().map(_.toSeq).toSet)
  }

  test("date-partitioned layout: cutoff predicates prune partitions at planning") {
    val dir = java.nio.file.Files.createTempDirectory("rates_part").toFile
    val path = new java.io.File(dir, "rates").getAbsolutePath
    MergeOps.writeDatePartitioned(fixture, path)
    val read = spark.read.parquet(path)
      .where(col("p_date") <= lit("2024-01-12").cast("date"))
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(p_date"))
    assert(read.count() == 4) // only the Jan 10/12 partitions are read
    // files on disk really are split by day
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("p_date=")) == 4)
  }

  test("partition-scoped merge rewrites ONLY the touched date partitions") {
    val dir = java.nio.file.Files.createTempDirectory("part_merge").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    def files(day: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(target, s"p_date=$day")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.lastModified(), f.length())).toMap
    }

    // batch 1: the Jan 10 + Jan 12 quotes
    MergeOps.mergeIntoDatePartitioned(target,
      fixture.where(col("event_id").isin(1, 2, 6, 10)), keys, ordering)
    val jan10 = files("2024-01-10")
    val jan12 = files("2024-01-12")
    assert(jan10.nonEmpty && jan12.nonEmpty)

    // batch 2 touches ONLY Jan 15/16 → the Jan 10/12 parquet files must
    // be byte-for-byte untouched (same names, mtimes, sizes)
    MergeOps.mergeIntoDatePartitioned(target,
      fixture.where(col("event_id").isin(3, 4, 5, 7, 8, 9, 11)), keys, ordering)
    assert(files("2024-01-10") == jan10)
    assert(files("2024-01-12") == jan12)
    assert(new java.io.File(target, "p_date=2024-01-16").exists())

    // batch 3: a STALE re-delivery of the superseded (EUR/USD, Jan 16)
    // quote — LWW must keep 1.16, and the old days stay untouched again
    MergeOps.mergeIntoDatePartitioned(target,
      fixture.where(col("event_id") === 4), keys, ordering)
    assert(files("2024-01-10") == jan10)
    assert(files("2024-01-12") == jan12)

    val result = spark.read.parquet(target)
    assert(result.count() == 10)
    val eur16 = result.where(col("ccy_couple") === "EUR/USD" &&
      col("date") === to_timestamp(lit("2024-01-16"))).collect().head
    assert(eur16.getAs[java.math.BigDecimal]("rate").doubleValue() == 1.16)
  }

  test("staging-swap crash recovery: re-running the batch merge converges") {
    val dir = java.nio.file.Files.createTempDirectory("crash_merge").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    val batch1 = fixture.where(col("event_id").isin(1, 2, 6, 10)) // Jan 10+12
    val batch2 = fixture // overlaps Jan 10/12, adds Jan 15/16 → merge path
    def tableSet() = spark.read.parquet(target)
      .select(col("ccy_couple"), col("date"), col("rate"), col("event_id"))
      .collect().map(_.toSeq).toSet
    val expected = MergeOps.upsertLatest(fixture, keys, ordering)
      .select(col("ccy_couple"), col("date"), col("rate"), col("event_id"))
      .collect().map(_.toSeq).toSet

    MergeOps.mergeIntoDatePartitioned(target, batch1, keys, ordering)

    // crash A — a previous merge died BETWEEN the staging write and the
    // dynamic overwrite: the target is untouched but an orphaned staging
    // tree holds a full merged copy. The retry must overwrite the
    // leftovers, converge, and clean the staging dir up.
    val staging = new java.io.File(target + "__staging")
    batch1.withColumn("p_date", to_date(col("date")))
      .write.mode("overwrite").parquet(staging.getAbsolutePath)
    MergeOps.mergeIntoDatePartitioned(target, batch2, keys, ordering)
    assert(tableSet() == expected)
    assert(!staging.exists())

    // crash B — the dynamic overwrite died HALF-SWAPPED: rebuild the
    // pre-merge table, then hand-swap ONLY Jan 12 to its merged content
    // (Jan 10 stale, the new days never landed). Retrying the same batch
    // merge must converge: LWW over (partially-merged ∪ batch) is the
    // same argmax as over (old ∪ batch).
    graft.util.Scratch.deleteRecursively(new java.io.File(target).toPath)
    MergeOps.mergeIntoDatePartitioned(target, batch1, keys, ordering)
    MergeOps.upsertLatest(fixture, keys, ordering)
      .where(to_date(col("date")) === lit("2024-01-12").cast("date"))
      .withColumn("p_date", to_date(col("date")))
      .write.partitionBy("p_date").option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(target)
    MergeOps.mergeIntoDatePartitioned(target, batch2, keys, ordering)
    assert(tableSet() == expected)
  }

  test("insertIfAbsent drops rows whose key already exists") {
    val existing = fixture.where(col("event_id") <= 9)
    val incoming = fixture // superset: 2 JPY rows are genuinely new
    val inserted = MergeOps.insertIfAbsent(incoming, existing, keys)
    assert(inserted.select("ccy_couple").distinct().collect()
      .map(_.getString(0)).toSet == Set("JPY/USD"))
    assert(inserted.count() == 2)
  }
}
