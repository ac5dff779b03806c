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

  test("mixed-schema table: versioned partitions keep their versions against a stale merge") {
    val dir = java.nio.file.Files.createTempDirectory("mixed_schema").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    val vOrdering =
      Seq(col("ingest_version"), col("ingest_batch"), col("timestamp"))
    // legacy partition: Jan 10 written by a PRE-versioning writer (no meta
    // columns in its parquet footers)
    MergeOps.writeDatePartitioned(fixture.where(col("event_id") === 1), target)
    // a versioned correction lands on Jan 16 with version 5
    MergeOps.mergeIntoDatePartitioned(target,
      fixture.where(col("event_id") === 5)
        .withColumn("ingest_version", lit(5L))
        .withColumn("ingest_batch", lit(0L)),
      keys, vOrdering)
    // stale re-delivery: version 1 carries the superseded 1.15 rate for
    // the same key. Without mergeSchema on the overlap read, parquet can
    // resolve the table schema from the LEGACY footer, hide the real
    // ingest_version column, backfill 0 over the applied 5 — and let this
    // stale row win LWW.
    MergeOps.mergeIntoDatePartitioned(target,
      fixture.where(col("event_id") === 4)
        .withColumn("ingest_version", lit(1L))
        .withColumn("ingest_batch", lit(1L)),
      keys, vOrdering)
    val jan16 = spark.read.option("mergeSchema", "true").parquet(target)
      .where(col("p_date") === lit("2024-01-16").cast("date")).collect().head
    assert(jan16.getAs[java.math.BigDecimal]("rate").doubleValue() == 1.16)
    assert(jan16.getAs[Long]("ingest_version") == 5L)
  }

  test("merge emits a per-batch CDC changelog; unchanged keys emit nothing") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_merge").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    val cl = new java.io.File(dir, "changelog").getAbsolutePath
    // batch 1: two fresh days → fast path, all inserts
    MergeOps.mergeIntoDatePartitioned(target,
      fixture.where(col("event_id").isin(1, 2)), keys, ordering,
      changelog = Some(cl), changelogBatchId = 1L)
    val c1 = spark.read.parquet(cl).collect()
    assert(c1.length == 2)
    assert(c1.forall(r => r.getAs[String]("change_type") == "insert"
      && r.getAs[Long]("cdc_batch") == 1L))
    // batch 2: an EXACT re-delivery (unchanged → no row), a corrected
    // rate on an existing key (update), a fresh day (insert), and a new
    // key on an existing day (insert)
    val corrected = fixture.where(col("event_id") === 2)
      .withColumn("rate", lit("1.125").cast(fixture.schema("rate").dataType))
      .withColumn("timestamp",
        col("timestamp") + expr("INTERVAL 1 MINUTE"))
    val batch2 = fixture.where(col("event_id").isin(1, 3, 6))
      .unionByName(corrected)
    MergeOps.mergeIntoDatePartitioned(target, batch2, keys, ordering,
      changelog = Some(cl), changelogBatchId = 2L)
    val c2 = spark.read.parquet(cl).where(col("cdc_batch") === 2L)
      .select(col("ccy_couple"), to_date(col("date")).cast("string").as("d"),
        col("change_type"), col("old_rate"), col("new_rate"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getDecimal(3)).map(_.doubleValue()),
        r.getDecimal(4).doubleValue())).toSet
    assert(c2 == Set(
      ("EUR/USD", "2024-01-12", "update", Some(1.12), 1.125),
      ("EUR/USD", "2024-01-15", "insert", None, 1.15),
      ("AUD/CAD", "2024-01-12", "insert", None, 0.916)))
    // the table itself reflects the applied changes
    val jan12 = spark.read.parquet(target)
      .where(col("ccy_couple") === "EUR/USD" &&
        col("p_date") === lit("2024-01-12").cast("date")).collect().head
    assert(jan12.getAs[java.math.BigDecimal]("rate").doubleValue() == 1.125)
  }

  test("deleteWhere keeps rows where the predicate evaluates to NULL") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_delete_null").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    MergeOps.mergeIntoDatePartitioned(target, fixture, keys, ordering)
    val before = spark.read.parquet(target)
    val total = before.count()
    val eur = before.where(col("ccy_couple") === "EUR/USD").count()
    assert(eur > 0 && eur < total)
    // no `otherwise` → the predicate is NULL for every non-EUR row; SQL
    // DELETE semantics say those rows SURVIVE (delete only where TRUE)
    MergeOps.deleteWhere(spark, target,
      when(col("ccy_couple") === "EUR/USD", lit(true)), keys)
    val after = spark.read.parquet(target)
    assert(after.count() == total - eur)
    assert(after.where(col("ccy_couple") === "EUR/USD").count() == 0)
  }

  test("deleteWhere retires keys, emits delete rows, prunes emptied partitions") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_delete").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    val cl = new java.io.File(dir, "changelog").getAbsolutePath
    MergeOps.mergeIntoDatePartitioned(target, fixture, keys, ordering,
      changelog = Some(cl), changelogBatchId = 1L)
    assert(spark.read.parquet(target).count() == 10)
    val cutoff = lit("2024-01-12").cast("date")

    // sweep 1 — PARTIAL days: only EUR/USD rows at or before the cutoff.
    // Jan 10 (EUR-only) empties → its partition dir must be REMOVED;
    // Jan 12 keeps its AUD + JPY survivors.
    MergeOps.deleteWhere(spark, target,
      col("p_date") <= cutoff && col("ccy_couple") === "EUR/USD", keys,
      changelog = Some(cl), changelogBatchId = 2L)
    assert(!new java.io.File(target, "p_date=2024-01-10").exists())
    val jan12 = spark.read.parquet(target)
      .where(col("p_date") === cutoff)
      .select("ccy_couple").collect().map(_.getString(0)).toSet
    assert(jan12 == Set("AUD/CAD", "JPY/USD"))
    val dels = spark.read.parquet(cl).where(col("cdc_batch") === 2L)
      .select(col("ccy_couple"), to_date(col("date")).cast("string").as("d"),
        col("change_type"), col("old_rate"), col("new_rate"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDecimal(3).doubleValue(), r.isNullAt(4))).toSet
    assert(dels == Set(
      ("EUR/USD", "2024-01-10", "delete", 1.10, true),
      ("EUR/USD", "2024-01-12", "delete", 1.12, true)))

    // sweep 2 — the rest of the expiring tail: Jan 12 empties too
    MergeOps.deleteWhere(spark, target, col("p_date") <= cutoff, keys,
      changelog = Some(cl), changelogBatchId = 3L)
    assert(!new java.io.File(target, "p_date=2024-01-12").exists())
    assert(spark.read.parquet(target)
      .where(col("p_date") <= cutoff).count() == 0)

    // the consumer: time travel over the delete-bearing changelog to its
    // head equals the post-sweep table (retired keys' newest change is
    // the delete, so applyChangelog drops them)
    val state = graft.operators.Cdc.applyChangelog(
      spark.read.parquet(cl), keys, Seq("rate"))
    assert(state.count() == 6)
    assert(state.where(to_date(col("date")) <= cutoff).count() == 0)
    val onDisk = spark.read.parquet(target)
      .select(col("ccy_couple"), to_date(col("date")).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(state.select(col("ccy_couple"), to_date(col("date")).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet == onDisk)
  }

  test("changelog write is day-sharded: a multi-day batch is not one task") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_shard").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    val cl = new java.io.File(dir, "changelog").getAbsolutePath
    // AQE would legitimately coalesce this toy batch's shards back to
    // one; disable that to observe the sharding a backfill would keep
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try MergeOps.mergeIntoDatePartitioned(target, fixture, keys, ordering,
      changelog = Some(cl), changelogBatchId = 1L)
    finally spark.conf.set(key, prev)
    // the 4-day batch fans out across day-hashed tasks (modulo hash
    // collisions between days), never the old single coalesce(1) funnel
    val files = new java.io.File(cl).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 2, s"expected day-sharded changelog files, got $files")
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
