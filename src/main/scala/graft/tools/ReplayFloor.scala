package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev measurement for the streaming-replay overhead analysis: times the
  * NULL replay (identical micro-batch machinery, empty batch body) next
  * to a real replay so COVERAGE.md can record the setup-vs-data split —
  * how much of a replay's wall clock is irreducible engine floor
  * (offset/commit log fsyncs, per-trigger planning, query start/stop)
  * versus the operator's own data work.
  *
  *   sbt "runMain graft.tools.ReplayFloor stream_neardup_incremental"
  */
object ReplayFloor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[A](what: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$what%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // warm the session (parquet listing, codegen, scratch root)
    graft.streaming.StreamReplay.replayNull(spark, dir)
    for (run <- 1 to 3) {
      time(s"null replay coalesced (1 batch)  run$run") {
        graft.streaming.StreamReplay.replayNull(spark, dir)
      }
      time(s"null replay per-file (2 batches) run$run") {
        graft.streaming.StreamReplay.replayNull(spark, dir, perFile = true)
      }
      for (n <- args)
        time(s"$n run$run") {
          graft.SparkEntry.queries(n)(spark, dir).count()
        }
    }
    spark.stop()
  }
}
