package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the maint_compact_rates gate query (dev tool):
  * where do its seconds actually go — the fixture write, the staging
  * hop, the sharded final write, or the post-write verify count?
  *
  *   sbt "runMain graft.tools.CompactProfile /root/testdata/sf0.1"
  */
object CompactProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[compact-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      val tmp = graft.util.Scratch.dir("graft_compact_prof").resolve("rates").toString
      t("fixture write (8/day)") {
        graft.model.Tables.rates(spark, dir).repartition(8)
          .withColumn("p_date", to_date(col("date")))
          .write.partitionBy("p_date").mode("overwrite").parquet(tmp)
      }
      val staging = tmp + "__compact_staging"
      val df = spark.read.parquet(tmp)
      t("staging write") {
        df.write.mode("overwrite").parquet(staging)
      }
      val staged = spark.read.parquet(staging)
      val n = t("staging count")(staged.count())
      t("sharded final write") {
        graft.operators.Compaction.shardByDay(staged, 1000000L)
          .write.partitionBy("p_date")
          .option("partitionOverwriteMode", "dynamic")
          .option("maxRecordsPerFile", "1000000")
          .mode("overwrite").parquet(tmp)
      }
      val m = t("post-write verify count")(spark.read.parquet(tmp).count())
      require(m == n)
      t("final read-back count") {
        spark.read.parquet(tmp)
          .select(col("event_id"), col("ccy_couple"), col("rate"),
            col("date"), col("event_time")).count()
      }
    }
    spark.stop()
  }
}
