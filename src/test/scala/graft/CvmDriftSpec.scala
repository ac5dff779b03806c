package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality

/** Two-sample Cramér-von-Mises drift: the integral form
  * T = S / (N²·n·m) with S = Σ w·d² over the distinct-value digest,
  * pinned on hand-computable fixtures (d the exact integer CDF-gap
  * numerator the KS gate already builds).
  */
class CvmDriftSpec extends SparkSuite {

  private def df(rows: (Double, String)*) = {
    import spark.implicits._
    rows.toDF("value", "ds")
      .select(col("value"), to_timestamp(col("ds")).as("ts"))
  }

  test("hand fixture: S and T exact; stationary halves do not flag") {
    // ref (day 1) = {1, 2}; cur (days 3-4) = {1, 3}; split at day 2
    // digest: v=1 d=0 w=2; v=2 d=2 w=1; v=3 d=0 w=1 -> S = 4
    // T = 4 / (4²·2·2) = 0.0625 (hand CvM: (nm/N²)·Σ(F−G)² = 0.25/4)
    val out = DataQuality.cvmDrift(df(
      1.0 -> "2024-01-01", 2.0 -> "2024-01-01",
      1.0 -> "2024-01-03", 3.0 -> "2024-01-04"), "value", "ts").head()
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L)
    assert(out.getString(2) == "4")
    assert(out.getDouble(3) == 0.0625)
    assert(!out.getBoolean(4))
  }

  test("full separation on the hand fixture reaches the n=m=2 maximum") {
    // shifted arm machinery: cur half +20 -> ref {1,2} vs cur {21,23}
    // digest d's: 2, 4, 2, 0 -> S = 24, T = 24/64 = 0.375 (the maximum
    // reachable at n=m=2 — below the asymptotic 5% bar by design; the
    // gate's alarm arm fires at corpus scale, not at N=4)
    val out = DataQuality.cvmDriftShifted(df(
      1.0 -> "2024-01-01", 2.0 -> "2024-01-01",
      1.0 -> "2024-01-03", 3.0 -> "2024-01-04"), "value", "ts").head()
    assert(out.getString(2) == "24")
    assert(out.getDouble(3) == 0.375)
  }

  test("incremental partials: batching-invariant, idempotent, equals one-shot") {
    val ev = graft.model.Tables.events(spark, sf("sf0.001"))
      .select(col("value"), col("ts"))
    val oneShot = DataQuality.cvmDrift(ev, "value", "ts")
      .collect().map(_.toString).toSeq
    def report(splits: Seq[org.apache.spark.sql.DataFrame],
        tag: String): (String, Seq[String]) = {
      val d = graft.util.Scratch.dir(s"cvm_$tag").toString
      splits.zipWithIndex.foreach { case (b, i) =>
        DataQuality.appendValueCountBatch(spark, d, b, "value", "ts",
          batchId = Some(i.toLong))
      }
      (d, DataQuality.cvmDriftFromPartials(spark, d)
        .collect().map(_.toString).toSeq)
    }
    // one batch vs three uneven batches split mid-day: identical report
    val (_, a) = report(Seq(ev), "one")
    val cut = ev.agg(min(to_date(col("ts")))).head().getDate(0)
    val (d3, b) = report(Seq(
      ev.where(to_date(col("ts")) === cut && col("value") < 500),
      ev.where(to_date(col("ts")) === cut && col("value") >= 500),
      ev.where(to_date(col("ts")) =!= cut)), "three")
    assert(a == oneShot && a.nonEmpty)
    assert(b == oneShot)
    // re-delivered batch is a no-op
    DataQuality.appendValueCountBatch(spark, d3,
      ev.where(to_date(col("ts")) === cut && col("value") < 500),
      "value", "ts", batchId = Some(0L))
    assert(DataQuality.cvmDriftFromPartials(spark, d3)
      .collect().map(_.toString).toSeq == oneShot)
    // ONE maintained state answers BOTH whole-CDF statistics: the KS
    // report over the same partials equals the one-shot ksDrift
    assert(DataQuality.ksDriftFromPartials(spark, d3)
      .collect().map(_.toString).toSeq ==
      DataQuality.ksDrift(ev, "value", "ts")
        .collect().map(_.toString).toSeq)
  }

  test("corpus: plain gate is quiet, shifted arm fires") {
    val ev = graft.model.Tables.events(spark, sf("sf0.001"))
    val plain = DataQuality.cvmDrift(ev, "value", "ts").head()
    val shifted = DataQuality.cvmDriftShifted(ev, "value", "ts").head()
    assert(!plain.getBoolean(4))
    assert(shifted.getBoolean(4))
    // CvM dominates noise: the shifted T must dwarf the stationary T
    // (measured ~68× at sf0.001 — 10× is the regression floor)
    assert(shifted.getDouble(3) > 10 * plain.getDouble(3))
  }
}
