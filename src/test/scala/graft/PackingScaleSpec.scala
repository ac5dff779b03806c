package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

import graft.text.Curation

/** Scale shape of the distributed sequence packer: the cumulative token
  * offset must never be computed by a single window partition per
  * language (the dominant language of a real corpus would land on one
  * task). The two-pass prefix sum must also be EXACTLY equivalent to the
  * naive per-language cumsum — including across chunk boundaries.
  */
class PackingScaleSpec extends SparkSuite {

  test("no doc-ordered window is partitioned by language alone") {
    val plan = Curation.packSequences(spark, sf("sf0.001"))
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LogicalWindow => w }
    assert(windows.nonEmpty)
    // any window that sorts by doc_id is the data-scaled cumsum; it must
    // be partitioned by (lang, chunk), never lang alone — the offsets
    // window (which sorts the tiny per-chunk aggregate by chunk) is the
    // only single-column-partitioned window allowed
    windows.foreach { w =>
      val sortsDocs = w.orderSpec.exists(_.child.references.exists(_.name == "doc_id"))
      if (sortsDocs) {
        assert(w.partitionSpec.size >= 2,
          s"data-scaled cumsum window partitioned by ${w.partitionSpec} only")
      }
    }
  }

  test("chunked prefix sum equals the greedy fill on a 99%-one-language corpus") {
    import spark.implicits._
    val budget = 100
    // 3000 docs, 99% "en", deliberately gappy doc_ids (so chunks are
    // unevenly filled) and token counts that straddle pack boundaries
    val docs = (0 until 3000).map { i =>
      val id = i.toLong * 7 // gaps: chunk occupancy varies
      val lang = if (i % 100 == 0) "de" else "en"
      val words = Seq.fill(1 + (i * 13 % 37))("w").mkString(" ")
      (id, lang, "web", words)
    }.toDF("doc_id", "lang", "source", "text")
    val d = graft.util.Scratch.dir("packing_scale")
    docs.write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)

    // chunkDocs = 64 forces ~330 chunks: chunk-boundary offsets carry
    val packed = Curation.packSequences(spark, d.toString, budget, chunkDocs = 64L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = packed.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      var off = 0L
      ds.sortBy(_._1).toSeq.map { case (id, lang, n, _) =>
        val pid = off / budget; off += n; (id, lang, n, pid)
      }
    }.toSet
    assert(packed.length == 3000 && packed.toSet == expected)
  }
}
