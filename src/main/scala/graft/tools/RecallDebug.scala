package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Inspect exact near-dup pairs missed by the simhash candidate
  * generation at a given sf (dev tool):
  *
  *   sbt "runMain graft.tools.RecallDebug /root/testdata/sf0.1"
  */
object RecallDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.NearDup
    val sh = NearDup.simhashDf(spark, dir)
    val exact = NearDup.ngramJaccardPairs(spark, dir)
      .select(col("doc_id"), col("nb_id"), col("jaccard"))
      .where(col("jaccard") >= 0.8)
    val cand = NearDup.simhashCandidatePairs(sh)
      .select(least(col("doc_id"), col("nb_id")).as("doc_id"),
        greatest(col("doc_id"), col("nb_id")).as("nb_id")).distinct()
    val missed = exact.join(cand, Seq("doc_id", "nb_id"), "left_anti")
      .join(sh, Seq("doc_id"))
      .join(sh.select(col("doc_id").as("nb_id"), col("simhash").as("nb_sh")),
        Seq("nb_id"))
      .select(col("doc_id"), col("nb_id"), col("jaccard"),
        bit_count(col("simhash").bitwiseXOR(col("nb_sh"))).as("hamming"),
        hex(col("simhash")).as("sh_a"), hex(col("nb_sh")).as("sh_b"))
    missed.show(20, truncate = false)
    // bucket sizes of each chunk of the missed docs
    val chunked = sh.select(col("doc_id"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ckey")))
    val sizes = chunked.groupBy("chunk", "ckey").agg(count(lit(1)).as("n"))
    val missIds = missed.select(col("doc_id")).unionByName(
      missed.select(col("nb_id").as("doc_id"))).distinct()
    chunked.join(missIds, Seq("doc_id")).join(sizes, Seq("chunk", "ckey"))
      .orderBy("doc_id", "chunk").show(40, truncate = false)
    spark.stop()
  }
}
