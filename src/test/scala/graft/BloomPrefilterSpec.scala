package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Bloom reference-corpus pre-filter. The one guarantee a Bloom filter
  * makes is ZERO FALSE NEGATIVES: the re-delivered duplicate cohort
  * (odd negative ids −2·id−1 — byte-identical text under a new id) must
  * flag maybe_dup on every row. The salted cohort (even negatives
  * −2·id−2) has novel fingerprints and may only flag at the
  * false-positive rate — with 2^16 bits over a few hundred reference
  * keys it must not degenerate to all-positive. Negative cohort ids are
  * collision-proof against corpus ids of ANY magnitude (an additive
  * offset conflates probe groups once real ids reach it).
  */
class BloomPrefilterSpec extends SparkSuite {

  test("duplicate cohort always flags; salted cohort stays separable") {
    val out = TextFunctions.bloomRefDedup(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) < 0L)) // every candidate id is negative
    val dup = out.filter(r => (-r.getLong(0)) % 2 == 1)
    val novel = out.filter(r => (-r.getLong(0)) % 2 == 0)
    assert(dup.nonEmpty && novel.nonEmpty)
    // zero false negatives: every true duplicate sets all its probes
    assert(dup.forall(_.getBoolean(3)))
    assert(dup.forall(r => r.getLong(2) == r.getLong(1)))
    // probe counts bounded by k, hits bounded by probes
    assert(out.forall { r =>
      val (p, s) = (r.getLong(1), r.getLong(2))
      p >= 1 && p <= 7 && s >= 0 && s <= p
    })
    // the filter separates: not every salted doc comes back positive
    assert(novel.exists(!_.getBoolean(3)))
  }

  test("bit_or partial folding is batching-invariant (incremental contract)") {
    val docs = graft.model.Tables.documents(spark, sf("sf0.001"))
    val oneShot = TextFunctions.bloomWordBits(docs, 16, 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fold per-slice partials exactly as the streaming replay does
    val partials = Seq(
      docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 === 2),
      docs.where(col("doc_id") % 3 === 2)) // re-delivery: idempotent
      .map(TextFunctions.bloomWordBits(_, 16, 7))
      .reduce(_ unionAll _)
    val folded = TextFunctions.bloomWordBitsOfPartials(partials)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == oneShot)
  }

  test("cohort ids stay collision-proof when corpus ids reach 100000+") {
    import spark.implicits._
    // the additive-offset scheme this replaced conflated probe groups
    // the moment real ids reached the offset; the signed-parity scheme
    // must keep every candidate id negative, injective, and disjoint
    // across cohorts at ANY corpus-id magnitude
    val docs = Seq(100000L, 100001L, 100005L, 100006L, 7L, 11L, 4611686018427381L)
      .map(id => (id, s"text of document $id"))
      .toDF("doc_id", "text")
    val cand = TextFunctions.bloomCandidates(docs).collect()
    val ids = cand.map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ < 0L))
    assert(ids.distinct.length == ids.length) // injective across cohorts
    // recovered source ids match the %5 selections exactly
    val dupSrc = ids.filter(i => (-i) % 2 == 1).map(i => (-i - 1) / 2).sorted
    val saltSrc = ids.filter(i => (-i) % 2 == 0).map(i => (-i - 2) / 2).sorted
    assert(dupSrc.toSeq == Seq(100000L, 100005L))
    assert(saltSrc.toSeq == Seq(11L, 100001L, 100006L, 4611686018427381L))
  }
}
