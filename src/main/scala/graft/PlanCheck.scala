package graft
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      println(s"===== $n =====")
      plan.split('\n').filter(l => l.contains("ReadSchema") || l.contains("PushedFilters") || l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin")).take(8).foreach(l => println(l.trim.take(220)))
    }
    spark.stop()
  }
}
