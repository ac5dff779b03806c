package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` output for named gate queries to files
  * (dev tool — the optimization rounds commit before/after plan text
  * under plans/rNN/):
  *
  *   sbt "runMain graft.tools.ExplainDump <outDir> <suffix> <query>..."
  *
  * Each query's plan lands at <outDir>/<query>_<suffix>.txt. Session
  * config mirrors graft.Bench so the dumped plans are the benched plans.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // executing first finalizes the adaptive plan so codegen spans and
      // final join strategies are visible (the plans the bench runs)
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
