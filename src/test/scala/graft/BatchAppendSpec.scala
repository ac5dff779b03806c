package graft

import org.apache.spark.sql.functions._

import graft.util.BatchAppend

/** The crash-safe append contract: retries of the SAME batch — even
  * after a mid-commit crash left a visible subset of its files — end
  * with exactly one copy of the batch in the destination, and other
  * batches' files are never touched.
  */
class BatchAppendSpec extends SparkSuite {

  test("same-batch retry replaces leftovers; cross-batch files untouched") {
    import spark.implicits._
    val dest = graft.util.Scratch.dir("batch_append").resolve("p").toString
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    val b1 = Seq(("a", 10L), ("c", 3L)).toDF("k", "n")

    BatchAppend.append(b0, dest, Some(0L))
    BatchAppend.append(b1, dest, Some(1L))
    // simulate a mid-commit crash of a RETRY of batch 1: a stray
    // visible file carrying batch-1 names (content = a duplicate row)
    val stray = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("b1-")).head
    java.nio.file.Files.copy(stray.toPath,
      new java.io.File(dest, "b1-99.parquet").toPath)
    val dupped = spark.read.parquet(dest)
      .groupBy(col("k")).agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dupped != Map("a" -> 11L, "b" -> 2L, "c" -> 3L)) // corrupted

    // the marker was never written, so the batch re-delivers: the
    // retry must clear every b1-* leftover and land exactly one copy
    BatchAppend.append(b1, dest, Some(1L))
    val healed = spark.read.parquet(dest)
      .groupBy(col("k")).agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(healed == Map("a" -> 11L, "b" -> 2L, "c" -> 3L))

    // a second full retry is still a no-op by content
    BatchAppend.append(b1, dest, Some(1L))
    val again = spark.read.parquet(dest)
      .groupBy(col("k")).agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == healed)
  }
}
