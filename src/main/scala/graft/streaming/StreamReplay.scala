package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.MergeOps
import graft.model.Tables

/** Oracle-checkable replay of the streaming ingest pipeline (SURVEY §2.10):
  * the rates feed is split into micro-batch files and driven through the
  * REAL Structured Streaming engine — file source → foreachBatch
  * last-writer-wins merge — and the final merged table must hash-match the
  * one-shot batch upsert oracle.
  *
  * Why this is a fair check: the merge ordering (timestamp, event_id) is a
  * total order, so sequential per-batch LWW merging converges to the global
  * argmax REGARDLESS of how rows are batched or which order the files are
  * picked up in. That makes the streaming path's result deterministic and
  * lets the DuckDB gate verify the foreachBatch machinery end-to-end,
  * instead of leaving streaming as spec-only coverage.
  */
object StreamReplay {

  /** Split rates into `nBatches` parquet files, stream them back one file
    * per micro-batch, merge each batch into a parquet target with
    * last-writer-wins on (ccy_couple, date), and return the final table.
    * The round-robin split is arbitrary on purpose — the result must not
    * depend on it.
    */
  def replayUpsert(s: SparkSession, dir: String, nBatches: Int = 4): DataFrame = {
    val tmp = Files.createTempDirectory("graft_stream_replay")
    val feed = tmp.resolve("feed").toString
    val target = tmp.resolve("table").toString
    val checkpoint = tmp.resolve("chk").toString

    val rates = Tables.rates(s, dir)
    rates.repartition(nBatches).write.mode("overwrite").parquet(feed)

    val keys = Seq("ccy_couple", "date")
    val ordering = Seq(col("timestamp"), col("event_id"))
    val query = s.readStream
      .schema(rates.schema)
      .option("maxFilesPerTrigger", "1") // one file = one micro-batch
      .parquet(feed)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val merged =
          if (new java.io.File(target).exists()) {
            val existing = spark.read.parquet(target)
            MergeOps.merge(existing, batch.select(existing.columns.map(col): _*),
              keys, ordering)
          } else MergeOps.upsertLatest(batch, keys, ordering)
        // materialize before overwrite so the read never races the rewrite
        // (at warehouse scale this is a transactional table-format commit)
        val m = merged.cache(); m.count()
        m.write.mode("overwrite").parquet(target)
        m.unpersist(); ()
      }
      .start()
    query.awaitTermination()

    s.read.parquet(target)
      .select(col("ccy_couple"), col("date"), col("rate"), col("event_time"))
  }
}
