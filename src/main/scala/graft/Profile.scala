package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knob for the size-based AQE coalescing experiment
    val spark = (if (sys.env.contains("PROFILE_AQE_SIZE"))
      builder
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
          sys.env.getOrElse("PROFILE_AQE_SIZE", "64m"))
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      var t0 = System.nanoTime(); fn(spark, dir).count()
      println(f"$n%-28s cold ${(System.nanoTime()-t0)/1e9}%8.2f s")
      t0 = System.nanoTime(); fn(spark, dir).count()
      println(f"$n%-28s warm ${(System.nanoTime()-t0)/1e9}%8.2f s")
      if (sys.env.contains("PROFILE_EXPLAIN")) fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
