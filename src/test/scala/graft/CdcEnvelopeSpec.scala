package graft

import org.apache.spark.sql.functions._

import graft.ingest.CdcEnvelope

/** External-CDC envelope interop: Debezium-style op/before/after JSON
  * adapted onto the engine's changelog contract.
  */
class CdcEnvelopeSpec extends SparkSuite {

  test("parseEnvelopes maps ops, picks key from either image, drops junk") {
    import spark.implicits._
    val feed = Seq(
      """{"op":"c","ts_ms":10,"before":null,"after":{"o_orderkey":1,"o_custkey":7,"o_totalprice":5.0,"o_orderpriority":"HI"}}""",
      """{"op":"u","ts_ms":20,"before":{"o_orderkey":2,"o_custkey":8,"o_totalprice":1.0,"o_orderpriority":"LO"},"after":{"o_orderkey":2,"o_custkey":8,"o_totalprice":2.0,"o_orderpriority":"LO"}}""",
      """{"op":"d","ts_ms":30,"before":{"o_orderkey":3,"o_custkey":9,"o_totalprice":4.0,"o_orderpriority":"LO"},"after":null}""",
      """not json at all"""
    ).toDF("payload")
    val got = CdcEnvelope.parseEnvelopes(feed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    // the malformed line is quarantined, never a parsed row
    assert(got == Set((1L, 10L, "insert"), (2L, 20L, "update"),
      (3L, 30L, "delete")))
    // and it IS routed to the quarantine side, verbatim
    val q = CdcEnvelope.quarantined(feed).as[String].collect()
    assert(q.toSeq == Seq("not json at all"))
  }

  test("quarantine catches structurally-valid JSON missing the contract") {
    import spark.implicits._
    val feed = Seq(
      """{"op":null,"ts_ms":5,"before":null,"after":{"o_orderkey":1}}""",
      """{"op":"c","ts_ms":null,"after":{"o_orderkey":1}}""",
      """{"op":"c","ts_ms":6,"before":null,"after":null}""",
      """{"op":"c","ts_ms":7,"after":{"o_orderkey":9,"o_custkey":1,"o_totalprice":1.0,"o_orderpriority":"X"}}"""
    ).toDF("payload")
    assert(CdcEnvelope.quarantined(feed).count() == 3L)
    val ok = CdcEnvelope.parseEnvelopes(feed).collect()
    assert(ok.length == 1 && ok(0).getLong(0) == 9L)
  }

  test("delete envelopes carry the key from before and null new_* values") {
    import spark.implicits._
    val feed = Seq(
      """{"op":"d","ts_ms":1,"before":{"o_orderkey":42,"o_custkey":1,"o_totalprice":9.0,"o_orderpriority":"X"},"after":null}"""
    ).toDF("payload")
    val r = CdcEnvelope.parseEnvelopes(feed).collect()(0)
    assert(r.getLong(0) == 42L && r.getString(2) == "delete")
    assert(r.isNullAt(r.fieldIndex("new_o_totalprice")))
  }

  test("appliedState equals the relational definition of the edits") {
    val dir = sf("sf0.001")
    val got = CdcEnvelope.appliedState(spark, dir)
    val expect = graft.model.Tables.orders(spark, dir)
      .where(pmod(col("o_orderkey"), lit(10)) =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
        col("o_orderpriority"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }
}
