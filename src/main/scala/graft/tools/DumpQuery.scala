package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted correctness-dump: run a SUBSET of SparkEntry.queries and
  * write each result to `outDir/<name>.parquet` (same layout as
  * graft.Verify, which runs everything). For iterating on one oracle
  * without paying the full 79-query Verify sweep:
  *
  *   sbt "runMain graft.tools.DumpQuery /root/testdata/sf0.01 /tmp/vq q1 q2"
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpQuery <sfDir> <outDir> <query>...")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dump] $name written")
    }
    // subset oracle_sql.json so tools/compare.py runs on this dump as-is
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
