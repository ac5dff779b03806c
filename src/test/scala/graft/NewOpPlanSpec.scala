package graft

import graft.text.TextFunctions

/** Plan-shape pins for the round-17 third-session operators: the scale
  * arguments in their Scaladocs as executable assertions — readability
  * is a shuffle-free codegen'd map, link prediction broadcasts its
  * degree digest, and the Welch/VR/moment gates reduce to single
  * map-side-combinable aggregations over the change digest.
  */
class NewOpPlanSpec extends SparkSuite {

  test("readability: no keyed Exchange, whole-stage codegen, pruned scan") {
    val df = TextFunctions.readability(spark, sf("sf0.001"))
    // execute first (through THIS frame's own QueryExecution): the
    // input rebalance makes AQE wrap the plan, and codegen markers only
    // appear on the FINALIZED adaptive plan
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the per-doc map induces NO KEYED shuffle — the only exchange
    // allowed is the loader's round-robin input rebalance
    // (Tables.spread), which is absent at scale by construction
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"unexpected keyed shuffle:\n$plan")
    // "*(n)" is executedPlan.toString's whole-stage-codegen marker
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined,
      s"no codegen span:\n$plan")
    // only doc_id and text must be read from the documents table
    val i = plan.indexOf("ReadSchema: ")
    val rs = plan.substring(i).takeWhile(_ != '\n')
    assert(rs.contains("doc_id") && rs.contains("text") &&
      !rs.contains("lang"), s"scan not pruned: $rs")
  }

  test("link prediction: degree digest rides as a broadcast join") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val plan = graft.operators.LinkPrediction.predictLinks(edges)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"degree digest not broadcast:\n$plan")
  }

  test("hnsw search: frontier broadcasts, edge/embedding tables never do") {
    val plan = graft.similarity.Similarity.hnswTopK(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // every hop joins the serving-bounded frontier as the BUILD side
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier not broadcast:\n$plan")
    // the corpus-sized relations must stream: no sort-merge join of the
    // edge artifact against anything at serving time
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized join shuffled at serving time:\n$plan")
  }

  test("ks/cvm drift: CDF prefix sum runs on PARTITIONED windows only") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val events = graft.model.Tables.events(spark, sf("sf0.001"))
    for (df <- Seq(
        graft.operators.DataQuality.ksDrift(events, "value", "ts"),
        graft.operators.DataQuality.cvmDrift(events, "value", "ts"))) {
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      // the two-pass form keeps a window (the in-partition running sum)
      assert(wins.nonEmpty, "prefix sum lost its window entirely")
      // but NEVER an unpartitioned one — that is the single-task
      // corpus-sized bottleneck the two-pass rewrite exists to kill
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"unpartitioned WindowExec (single-task prefix sum):\n" +
          df.queryExecution.optimizedPlan)
    }
  }

  test("incremental similarity join: batch encode broadcasts the frozen rank map") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val batch = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).limit(20)
    // the per-batch ingest join must build on the vocab-bounded rank
    // table — a sort-merge here would shuffle every arriving batch's
    // trigram explosion on the token key, turning O(batch) admission
    // into a batch-sized shuffle per micro-batch
    val plan = graft.text.PpJoin.encodeAgainst(batch,
        graft.text.PpJoin.trainedRanks(spark, dir), eager = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rank map not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"batch encode sort-merges:\n$plan")
  }

  test("higher moments / monday effect: one hash-aggregate pair over the digest") {
    val rates = graft.model.Tables.rates(spark, sf("sf0.001"))
    for (df <- Seq(graft.analysis.MarketAnalytics.higherMoments(rates),
        graft.analysis.MarketAnalytics.mondayEffect(rates))) {
      val plan = df.queryExecution.executedPlan.toString
      // partial + final HashAggregate = map-side combine is in effect
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"no partial aggregation:\n$plan")
    }
  }
}
