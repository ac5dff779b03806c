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

  test("property: interval overlap equals the naive join on random intervals") {
    import spark.implicits._
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def intervals(n: Int, idBase: Long) = (0 until n).map { i =>
        val k = rnd.nextInt(4).toLong
        val s = rnd.nextInt(500000) * 1000000L          // 0..500s in µs
        val len = rnd.nextInt(60000) * 1000000L         // 0..60s
        (k, idBase + i, new Timestamp(s / 1000), new Timestamp((s + len) / 1000))
      }
      val a = intervals(60, 1000).toDF("k", "a_id", "a_start", "a_end")
      val b = intervals(60, 2000).toDF("k", "b_id", "b_start", "b_end")
      val naive = a.join(b, Seq("k"))
        .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // sorted WITH duplicates: a double emission would show
      Seq(1000000L, 7000000L, 60000000L).foreach { bucket =>
        val got = graft.operators.RangeJoin.intervalOverlap(a, b,
            "a_start", "a_end", "b_start", "b_end", Seq("k"), bucket)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got == naive, s"seed=$seed bucket=$bucket")
      }
    }
  }

  test("property: skyline equals the naive dominance filter on random points") {
    import spark.implicits._
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pts = (0 until 80).map { i =>
        (i.toLong, rnd.nextInt(40).toDouble,
          java.sql.Date.valueOf(f"2024-01-${1 + rnd.nextInt(28)}%02d"))
      }.toDF("id", "x", "y")
      val fast = graft.operators.Skyline
        .skylineMax2D(pts, col("x"), col("y"), chunkW = 7.0)
        .select("id").collect().map(_.getLong(0)).toSet
      val rows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDate(2)))
      val naive = rows.filter { case (_, x, y) =>
        !rows.exists { case (_, qx, qy) =>
          qx >= x && qy.compareTo(y) >= 0 && (qx > x || qy.compareTo(y) > 0)
        }
      }.map(_._1).toSet
      assert(fast == naive, s"seed=$seed")
    }
  }

  test("property: triangle counts equal the naive triple scan on random graphs") {
    import spark.implicits._
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 14
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (u.toLong, v.toLong))
      // feed duplicates and reversals too — canonicalization is part of
      // the contract
      val noisy = edges ++ edges.take(5).map(_.swap)
      val out = graft.operators.Triangles
        .triangleCounts(noisy.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val eset = edges.toSet
      def adj(a: Long, b: Long) =
        eset.contains((math.min(a, b), math.max(a, b)))
      val naive = scala.collection.mutable.Map.empty[Long, Long]
      for (a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n)
        if (adj(a, b) && adj(b, c) && adj(a, c))
          Seq(a, b, c).foreach(v => naive(v) = naive.getOrElse(v.toLong, 0L) + 1)
      assert(out == naive.toMap, s"seed=$seed")
    }
  }

  test("property: hll registers are partitioning- and duplication-invariant") {
    import spark.implicits._
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = (0 until 500).map(_ => rnd.nextLong() % 1000)
      val df = keys.toDF("key")
      val dup = (keys ++ keys ++ keys.take(100)).toDF("key").repartition(7)
      val a = graft.operators.Hll.registers(df, "key").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      val b = graft.operators.Hll.registers(dup, "key").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(a == b, s"seed=$seed")
    }
  }

  test("property: pagerank mass conservation and positivity on random graphs") {
    import spark.implicits._
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 8
      // every node gets at least one out-edge → no dangling leak: the
      // total mass must stay teleport + damping·1 = 1 (up to rounding)
      val edges = (0 until n).flatMap { s0 =>
        (0 until 1 + rnd.nextInt(3)).map { _ =>
          (s0.toLong, rnd.nextInt(n).toLong,
            new java.math.BigDecimal(1 + rnd.nextInt(100)).setScale(2))
        }
      }.distinct
      val e = edges.toDF("src", "dst", "w")
        .groupBy("src", "dst").agg(sum(col("w").cast("decimal(18,2)")).as("w"))
      val pr = graft.operators.PageRank.weightedPageRank(e, iters = 6)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(pr.size == n || pr.size == e.select("src").union(e.select("dst"))
        .distinct().count().toInt)
      pr.values.foreach(p => assert(p > 0.0 && p < 1.0))
      assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"seed=$seed mass=${pr.values.sum}")
    }
  }
}
