package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: salt the skewed (large) side's key with a
  * random-but-deterministic shard id, replicate the small side across all
  * shards, and join on (key, shard). A hot key's rows then spread over
  * `shards` reducers instead of hammering one. AQE's skew-join handles
  * many cases at runtime; explicit salting remains the tool when a single
  * key dominates beyond what AQE's partition splitting can rebalance, and
  * this operator names that plan shape.
  *
  * The shard id is a hash of the large side's full row (pmod(hash(...)),
  * not a RNG), so the result is deterministic and re-runnable.
  */
object SaltedJoin {

  def saltedEquiJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      shards: Int = 8, joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__shard",
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(shards)))
    val replicatedSmall = small.withColumn("__shard",
      explode(array((0 until shards).map(lit): _*)))
    saltedLarge.join(replicatedSmall, keys :+ "__shard", joinType)
      .drop("__shard")
  }
}
