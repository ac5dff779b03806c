package graft

import org.apache.spark.sql.functions._

import graft.fixtures.RateFixtures
import graft.ingest.MergeOps
import graft.operators.Scd2

/** SCD2 history invariants: intervals chain gaplessly per key, exactly
  * one open (current) interval per key, and the current rows reproduce
  * the destructive upsert's table — history is a strict superset of what
  * the reference keeps.
  */
class Scd2Spec extends SparkSuite {

  private val keys = Seq("ccy_couple", "date")

  private def hist = Scd2.history(RateFixtures.exchangeRates(spark),
    keys, "timestamp", col("event_id"))

  test("intervals chain: each version's valid_to is the next valid_from") {
    val rows = hist.select(col("ccy_couple"), col("date").cast("string"),
        unix_micros(col("valid_from")), unix_micros(col("valid_to")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    rows.groupBy(_._1).values.foreach { vs =>
      val sorted = vs.map(_._2).sortBy(_._1)
      sorted.zip(sorted.tail).foreach { case ((_, to), (from2, _)) =>
        assert(to.contains(from2)) // gapless chain
      }
      assert(sorted.init.forall(_._2.isDefined) && sorted.last._2.isEmpty)
    }
  }

  test("current rows = the upsert table (history strictly supersets it)") {
    val current = hist.where(col("is_current"))
      .select(col("ccy_couple"), col("date"), col("rate"))
      .collect().map(_.toSeq).toSet
    val upserted = MergeOps.upsertLatest(RateFixtures.exchangeRates(spark),
        keys, Seq(col("timestamp"), col("event_id")))
      .select(col("ccy_couple"), col("date"), col("rate"))
      .collect().map(_.toSeq).toSet
    assert(current == upserted)
    assert(hist.count() == RateFixtures.rows.size) // nothing dropped
  }
}
