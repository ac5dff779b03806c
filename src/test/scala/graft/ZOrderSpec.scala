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

  test("hilbert code: consecutive codes are ALWAYS grid neighbors (morton is not)") {
    import spark.implicits._
    import graft.functions.HilbertCode16
    // the defining locality property on a full 8×8 sub-grid (coords
    // scaled to the top 3 of the 16 levels so the walk stays dense):
    // sorting cells by code, every consecutive pair must be at
    // Manhattan distance exactly 1 — the property the Z-curve breaks
    // at every power-of-two boundary
    val step = 1 << 13 // 8 cells across the 16-bit range
    val cells = for (x <- 0 until 8; y <- 0 until 8)
      yield (x.toLong * step, y.toLong * step)
    val coded = cells.toDF("a", "b")
      .select(col("a"), col("b"), HilbertCode16(col("a"), col("b")).as("h"),
        MortonCode16(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0) / step, r.getLong(1) / step,
        r.getLong(2), r.getLong(3)))
    def manhattanBreaks(key: ((Long, Long, Long, Long)) => Long): Int =
      coded.sortBy(key).sliding(2).count {
        case Array(p, q) =>
          (p._1 - q._1).abs + (p._2 - q._2).abs != 1
        case _ => false
      }
    assert(manhattanBreaks(_._3) == 0, "hilbert walk must never jump")
    assert(manhattanBreaks(_._4) > 0, "the z-curve jumps at boundaries")
    // codes are a bijection on the grid
    assert(coded.map(_._3).distinct.length == 64)
    // codegen path == interpreted reference (the nullSafeEval twin)
    def ref(a0: Long, b0: Long): Long = {
      var x = a0 & 0xFFFFL; var y = b0 & 0xFFFFL; var d = 0L
      var s = 32768L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    coded.foreach { case (xc, yc, h, _) =>
      assert(h == ref(xc * step, yc * step))
    }
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
    val n = ZOrder.writeZOrdered(ev, "user_id", "ts_us", zdir,
      nFiles = Some(16))
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

  test("file count is data-sized, never the constant-N scale trap") {
    val root = graft.util.Scratch.dir("zorder_sized")
    val ev = Tables.events(spark, sf("sf0.001")).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    val n = ev.count()
    def parquetFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))

    // target covering the whole table → exactly one file
    val one = root.resolve("one").toString
    ZOrder.writeZOrdered(ev, "user_id", "ts_us", one, targetRowsPerFile = n * 10)
    assert(parquetFiles(one) == 1)

    // small target → file count tracks ceil(n/target) (range-boundary
    // sampling can split a fat partition, so allow up to 2× the ceil)
    // and no file exceeds the target row bound
    val many = root.resolve("many").toString
    val target = 500L
    val ceil = ((n + target - 1) / target).toInt
    ZOrder.writeZOrdered(ev, "user_id", "ts_us", many, targetRowsPerFile = target)
    val files = parquetFiles(many)
    assert(files >= ceil && files <= 2 * ceil, s"files=$files ceil=$ceil")
    val maxPerFile = spark.read.parquet(many)
      .groupBy(input_file_name()).count()
      .agg(max(col("count"))).collect().head.getLong(0)
    assert(maxPerFile <= target)
  }
}
