package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.RateAnalysis
import graft.fixtures.RateFixtures.RateRow
import graft.ingest.MergeOps

/** Randomized property checks (seeded, deterministic) over the invariants
  * SURVEY §5.2 names: upsert idempotence, latest-per-pair = argmax,
  * previous = 2nd-latest, formulation agreement, pct-change algebra.
  */
class PropertiesSpec extends SparkSuite {

  private def randomRates(seed: Long, nPairs: Int = 6, nRows: Int = 120): DataFrame = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    // (pair, event_time) kept unique: the reference's own dedup key
    val rows = rnd.shuffle((0 until nRows).toList).zipWithIndex.map { case (i, id) =>
      val pair = s"P${i % nPairs}"
      val day = i / nPairs // unique (pair, day)
      val et = day * 86400000L
      RateRow(id.toLong, et, pair,
        new java.math.BigDecimal(1.0 + rnd.nextDouble()).setScale(6,
          java.math.RoundingMode.HALF_UP),
        new Timestamp(et), new Timestamp(1700000000000L + rnd.nextInt(25) * 1000L))
    }
    spark.createDataset(rows).toDF()
  }

  private val keys = Seq("ccy_couple", "date")
  private def ordering = Seq(col("timestamp"), col("event_id"))

  test("property: upsert is idempotent and a projection of its input") {
    (1L to 3L).foreach { seed =>
      val df = randomRates(seed)
      val once = MergeOps.upsertLatest(df, keys, ordering)
      val twice = MergeOps.upsertLatest(once, keys, ordering)
      assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
      assert(MergeOps.merge(once, once, keys, ordering).count() == once.count())
    }
  }

  test("property: latestPerPair equals max_by argmax per pair") {
    (1L to 3L).foreach { seed =>
      val df = randomRates(seed)
      val viaWindow = RateAnalysis.latestPerPair(df)
        .select(col("ccy_couple"), col("event_time"), col("rate").cast("double"))
        .collect().map(_.toSeq).toSet
      val viaArgmax = df.groupBy("ccy_couple")
        .agg(max(col("event_time")).as("event_time"),
          max_by(col("rate"), struct(col("event_time"), col("event_id")))
            .cast("double").as("rate"))
        .select(col("ccy_couple"), col("event_time"), col("rate"))
        .collect().map(_.toSeq).toSet
      assert(viaWindow == viaArgmax)
    }
  }

  test("property: the three previous-rate formulations agree on random data") {
    (1L to 3L).foreach { seed =>
      val df = randomRates(seed)
      val cut = expr("TIMESTAMP '1970-01-10 17:00:00'")
      def key(d: DataFrame) = d.select(col("ccy_couple"),
        col("previous_rate").cast("double"), col("previous_event_time"))
        .collect().map(_.toSeq).toSet
      val a = key(RateAnalysis.previousRates(df, cut))
      val b = key(RateAnalysis.previousRatesJoinAgg(df, cut))
      val c = key(RateAnalysis.previousRatesCompatSql(df,
        "TIMESTAMP '1970-01-10 17:00:00'"))
      assert(a.nonEmpty && a == b && a == c)
    }
  }

  test("property: pct-change algebra — zero at equality, sign follows direction") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((1.0 + rnd.nextDouble() * 10,
      1.0 + rnd.nextDouble() * 10)).toDF("cur", "prev")
    val out = pairs.select(col("cur"), col("prev"),
      RateAnalysis.pctChange(col("cur"), col("prev")).cast("double").as("pct"))
      .collect()
    out.foreach { r =>
      val (cur, prev, pct) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      if (cur == prev) assert(pct == 0.0)
      // rounding to 2dp can legitimately flatten tiny moves to ±0.0
      if (pct > 0) assert(cur > prev)
      if (pct < 0) assert(cur < prev)
    }
    val self = pairs.select(
      RateAnalysis.pctChange(col("cur"), col("cur")).cast("double").as("z"))
      .where(col("z") =!= 0.0).count()
    assert(self == 0)
  }
}
