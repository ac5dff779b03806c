package graft

import org.apache.spark.sql.functions._

import graft.functions.MortonCode16
import graft.model.Tables
import graft.operators.ZOrder

/** Z-order layout evidence: the Morton code is the textbook interleave,
  * and the rewritten files carry tight min/max envelopes on BOTH
  * dimensions — where a single-column sort narrows only its own.
  */
class ZOrderSpec extends SparkSuite {

  test("morton code interleaves bits (expression = reference interleave)") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 16) {
        out |= ((a >> i) & 1L) << (2 * i + 1)
        out |= ((b >> i) & 1L) << (2 * i)
      }
      out
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (0xABCDL, 0x1234L), (65535L, 65535L))
    val got = cases.toDF("a", "b")
      .select(MortonCode16(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => ref(a, b) })
    // z-locality smoke: neighbors in both dims give nearby codes
    assert(ref(5, 5) < ref(5, 6) && ref(5, 6) < ref(8, 8))
  }

  test("z-ordered files bound BOTH dimensions; single-dim sort only one") {
    val root = graft.util.Scratch.dir("zorder_spec")
    val ev = Tables.events(spark, sf("sf0.01")).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))

    def spans(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("user_id")) - min(col("user_id"))).as("us"),
          (max(col("ts_us")) - min(col("ts_us"))).as("ts"))
        .agg(avg(col("us")), avg(col("ts"))).collect().head
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val bounds = ev.agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double"),
      (max(col("ts_us")) - min(col("ts_us"))).cast("double")).collect().head
    val (globalUser, globalTs) = (bounds.getDouble(0), bounds.getDouble(1))

    val zdir = root.resolve("z").toString
    val n = ZOrder.writeZOrdered(ev, "user_id", "ts_us", zdir, nFiles = 16)
    assert(n == ev.count())
    val (zUser, zTs) = spans(zdir)

    val sdir = root.resolve("s").toString
    ev.repartitionByRange(16, col("user_id"))
      .write.mode("overwrite").parquet(sdir)
    val (sUser, sTs) = spans(sdir)

    // z-order: BOTH envelopes well under the global span
    assert(zUser < 0.6 * globalUser, s"user span $zUser vs $globalUser")
    assert(zTs < 0.6 * globalTs, s"ts span $zTs vs $globalTs")
    // single-dim layout: its own column tight, the other essentially global
    assert(sUser < zUser)
    assert(sTs > 0.9 * globalTs)
  }
}
