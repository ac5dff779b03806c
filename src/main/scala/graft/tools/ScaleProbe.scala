package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: materialize an N×-replicated copy of the fixture
  * tables (ID-shifted so keys stay unique and KEY CARDINALITY grows N×,
  * text/embeddings perturbed per replica so near-dup and ANN operators
  * see neighbors, not byte-identical clones) and time representative
  * operators at 1× vs N× on identical session settings.
  *
  *   sbt "runMain graft.tools.ScaleProbe 10 q_sessionize dedup_minhash_lsh"
  *
  * The point is the RATIO, not the absolute seconds: an operator whose
  * plan is scale-safe (shuffle-on-key, broadcast-bounded, bucket-capped)
  * should grow ~linearly in rows; a quadratic or driver-bound plan shows
  * up as a super-linear cliff long before a cluster run would find it.
  * This is a dev tool — fixture-scale evidence for the 100 TB design
  * arguments in COVERAGE.md, not a benchmark artifact.
  */
object ScaleProbe {

  private val replicated = Set("events", "documents", "embeddings", "orders")

  /** One replica, ids shifted into a disjoint range per k; k = 0 is the
    * identity so 1× output equals the input tables.
    */
  private def replica(name: String, df: DataFrame, k: Int): DataFrame =
    name match {
      case "events" =>
        // user_id shift grows the key population (new "currencies"/users
        // per replica) — the harder direction for per-key operators
        df.withColumn("event_id", col("event_id") + lit(k * 100000000000L))
          .withColumn("user_id", col("user_id") + lit(k * 1000000L))
      case "documents" =>
        // per-replica token: replicas are NEAR-duplicates (high Jaccard,
        // distinct fingerprints), the population near-dup ops must bucket
        df.withColumn("doc_id", col("doc_id") + lit(k * 1000000000L))
          .withColumn("text",
            if (k == 0) col("text")
            else concat(col("text"), lit(s" replica$k")))
      case "embeddings" =>
        // small per-replica rotation-free perturbation: neighbors across
        // replicas at cosine ~0.999..., so ANN candidate sets grow N×
        df.withColumn("vec_id", col("vec_id") + lit(k * 1000000000L))
          .withColumn("embedding",
            if (k == 0) col("embedding")
            else transform(col("embedding"),
              x => (x + lit(k * 1e-3f)).cast("float")))
      case "orders" =>
        // order keys shift into disjoint ranges; customer population
        // grows N× (the per-key direction for FD/RFM/skyline probes)
        df.withColumn("o_orderkey", col("o_orderkey") + lit(k * 1000000000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(k * 1000000000L))
      case _ => df
    }

  private def materialize(s: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit =
    graft.model.Tables.names.foreach { t =>
      val base = s.read.parquet(s"$srcDir/$t.parquet")
      val scaled =
        if (replicated(t) && factor > 1)
          (0 until factor).map(replica(t, base, _)).reduce(_ unionByName _)
        else base
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }

  private def timeQuery(s: SparkSession, dir: String, name: String): Double = {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(s, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    s.catalog.clearCache()
    dt
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <factor> [query...]")
    val factor = args(0).toInt
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_sessionize", "fx_latest_per_pair", "fx_change_corr",
        "dedup_minhash_lsh", "dedup_exact", "text_stats",
        "sim_ivf_topk", "cur_pipeline_e2e")
    // validate BEFORE the expensive materialization step
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.util.Scratch.dir("graft_scale_probe")
    val base = root.resolve("x1").toString
    val big = root.resolve(s"x$factor").toString
    materialize(spark, srcDir, base, 1)
    materialize(spark, srcDir, big, factor)

    println(f"[probe] src=$srcDir factor=${factor}x")
    names.foreach { name =>
      try {
        // warm both paths once (codegen/JIT), then time
        timeQuery(spark, base, name)
        val t1 = timeQuery(spark, base, name)
        timeQuery(spark, big, name)
        val tN = timeQuery(spark, big, name)
        println(f"[probe] $name%-28s 1x=$t1%7.2fs ${factor}x=$tN%7.2fs ratio=${tN / t1}%5.2f")
      } catch {
        // one failing query must not abort the remaining measurements
        case e: Throwable =>
          println(s"[probe] $name FAILED: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    spark.stop()
  }
}
