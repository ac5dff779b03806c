package graft

import org.apache.spark.sql.functions._

import graft.sources.SchemaEvolution

/** Pins the schema-evolution read: the generations are genuinely written
  * with different parquet schemas, the merged scan null-backfills, and
  * predicate pushdown still reaches the multi-generation scan.
  */
class SchemaEvolutionSpec extends SparkSuite {

  private lazy val dir = sf("sf0.001")

  test("generation files carry genuinely different schemas") {
    val root = SchemaEvolution.generationsDir(spark, dir)
    assert(spark.read.parquet(s"$root/gen1").columns.toSeq ==
      Seq("doc_id", "lang"))
    assert(spark.read.parquet(s"$root/gen2").columns.toSeq ==
      Seq("doc_id", "lang", "source"))
    assert(spark.read.parquet(s"$root/gen3").columns.toSeq ==
      Seq("doc_id", "lang", "source", "n_chars"))
  }

  test("merged read null-backfills columns a generation predates") {
    val evolved = SchemaEvolution.evolvedDocsRead(spark, dir)
    val byGen = evolved
      .groupBy((col("doc_id") % 3).as("gen"))
      .agg(count(lit(1)).as("n"),
        count(col("source")).as("n_source"),
        count(col("n_chars")).as("n_chars_set"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // gen1 rows: source and n_chars all null; gen2: n_chars null
    assert(byGen(0L)._2 == 0L && byGen(0L)._3 == 0L)
    assert(byGen(1L)._2 == byGen(1L)._1 && byGen(1L)._3 == 0L)
    assert(byGen(2L)._2 == byGen(2L)._1 && byGen(2L)._3 == byGen(2L)._1)
    // and the union covers every source document exactly once
    assert(evolved.count() ==
      graft.model.Tables.documents(spark, dir).count())
  }

  test("filter pushdown reaches the merged multi-generation scan") {
    val plan = SchemaEvolution.evolvedDocsRead(spark, dir)
      .where(col("doc_id") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)]"),
      s"expected doc_id pushdown in:\n$plan")
  }
}
