package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing of the cross-modal / beam-search serving chain
  * (dev tool): where do the gate seconds actually go — the typed media
  * decode, the brute scoring join, the top-k window exchange, or the
  * per-hop beam jobs?
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.PhaseProbe"
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { pass =>
      println(s"-- pass $pass --")
      val enc = graft.multimodal.Multimodal.mediaEmbeddingTable(spark, dir)
      t("media decode (count)") { enc.count() }
      t("media decode (noop)") { noop(enc) }
      val emb = graft.model.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val scoredDf = enc.crossJoin(broadcast(emb))
        .select(col("doc_id"), col("vec_id"),
          round(graft.functions.CosineSimilarity(
            col("media_vec"), col("embedding")), 6).as("cos_sim"))
      t("score crossjoin (noop, no window)") { noop(scoredDf) }
      if (pass == 2) {
        println("---- scored plan ----")
        println(scoredDf.queryExecution.executedPlan.toString.take(3000))
      }
      val encCp = t("enc localCheckpoint") { enc.localCheckpoint() }
      val scoredCp = encCp.crossJoin(broadcast(emb))
        .select(col("doc_id"), col("vec_id"),
          round(graft.functions.CosineSimilarity(
            col("media_vec"), col("embedding")), 6).as("cos_sim"))
      t("score crossjoin from checkpoint (noop)") { noop(scoredCp) }
      val embA = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      val embB = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"))
      val pure = embA.crossJoin(broadcast(embB))
        .select(col("ida"), col("idb"),
          round(graft.functions.CosineSimilarity(
            col("ea"), col("eb")), 6).as("cos_sim"))
      t("emb x emb 4M-pair crossjoin (noop)") { noop(pure) }
      println(s"[phase] emb scan partitions = ${emb.rdd.getNumPartitions}, " +
        s"enc partitions = ${enc.rdd.getNumPartitions}")
      val pureRep = embA.repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(broadcast(embB))
        .select(col("ida"), col("idb"),
          round(graft.functions.CosineSimilarity(
            col("ea"), col("eb")), 6).as("cos_sim"))
      t("emb x emb repartitioned (noop)") { noop(pureRep) }
      val scoredRep = encCp.repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(broadcast(emb))
        .select(col("doc_id"), col("vec_id"),
          round(graft.functions.CosineSimilarity(
            col("media_vec"), col("embedding")), 6).as("cos_sim"))
      t("score crossjoin repartitioned (noop)") { noop(scoredRep) }
      import org.apache.spark.sql.expressions.Window
      val wtop = Window.partitionBy(col("doc_id"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
      t("score repart + window topk (noop)") {
        noop(scoredRep.withColumn("rank",
          row_number().over(wtop)).where(col("rank") <= 3))
      }
      t("full crossModalTopK (count)") {
        graft.multimodal.Multimodal.crossModalTopK(spark, dir).count()
      }
      t("full crossModalTopK (noop)") {
        noop(graft.multimodal.Multimodal.crossModalTopK(spark, dir))
      }
      t("hnswTopK sim (count)") {
        graft.similarity.Similarity.hnswTopK(spark, dir).count()
      }
      t("crossModalHnswTopK (count)") {
        noop(graft.multimodal.Multimodal.crossModalHnswTopK(spark, dir))
      }
      // ---- similarity-join twin: per-phase split of one replay ----
      val docs = graft.model.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val half = t("split docs into 2 batches") {
        val h = docs.withColumn("__b", pmod(col("doc_id"), lit(2)))
          .localCheckpoint()
        (h.where(col("__b") === 0).drop("__b"),
         h.where(col("__b") === 1).drop("__b"))
      }
      val idx = graft.util.Scratch.dir(s"graft_probe_ppjoin_$pass")
        .resolve("index").toString
      t("ppjoin train ranks (staged artifacts)") {
        graft.text.PpJoin.trainedRanks(spark, dir).count()
      }
      t("ppjoin append batch 1") {
        graft.text.PpJoin.appendJaccardIndexBatch(spark, idx, half._1, dir,
          batchId = Some(0L))
      }
      t("ppjoin append batch 2") {
        graft.text.PpJoin.appendJaccardIndexBatch(spark, idx, half._2, dir,
          batchId = Some(1L))
      }
      t("ppjoin report from index") {
        graft.text.PpJoin.jaccardPairsFromIndex(spark, idx).count()
      }
    }
    spark.stop()
  }
}
