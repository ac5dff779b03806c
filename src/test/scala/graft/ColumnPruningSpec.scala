package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Pins that projections reach the parquet scan as pruned ReadSchema —
  * a 2-column projection over an 11-column table must read 2 columns,
  * and a nested-field projection must prune INSIDE the struct. At 100 TB
  * the difference between reading 2 columns and 11 is the difference
  * between a working scan and a dead one.
  */
class ColumnPruningSpec extends SparkSuite {

  private def readSchema(plan: String): String = {
    val i = plan.indexOf("ReadSchema: ")
    assert(i >= 0, s"no ReadSchema in plan:\n$plan")
    plan.substring(i).takeWhile(_ != '\n')
  }

  test("2-column projection over 11-column lineitem prunes the scan") {
    val plan = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_quantity"))
      .where(col("l_quantity") > 10)
      .queryExecution.executedPlan.toString
    val rs = readSchema(plan)
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"), rs)
    assert(!rs.contains("l_extendedprice") && !rs.contains("l_returnflag"), rs)
  }

  test("nested-field projection prunes inside the struct") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("nested_prune").resolve("t").toString
    Seq((1L, ("a", 10L, "keepout")), (2L, ("b", 20L, "keepout")))
      .toDF("id", "meta")
      .select(col("id"), col("meta").cast(
        "struct<src:string,n:bigint,unused:string>").as("meta"))
      .write.parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(col("id"), col("meta.src"))
      .queryExecution.executedPlan.toString
    val rs = readSchema(plan)
    assert(rs.contains("src"), rs)
    assert(!rs.contains("unused") && !rs.contains("n:bigint"), rs)
  }
}
