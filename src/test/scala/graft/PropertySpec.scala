package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.analysis.RateAnalysis
import graft.ingest.MergeOps

/** The SURVEY §5.3 property tests (ScalaCheck over generated rate-event
  * relations): upsert idempotence, latest-per-pair = total-order argmax,
  * previous-rate = 2nd-latest before the cutoff (native window vs
  * hand-decorrelated join+agg vs a driver-side brute force), and
  * pct-change = the HALF_UP BigDecimal algebra. Each property runs a
  * fixed number of seeded cases so the suite is deterministic.
  */
class PropertySpec extends SparkSuite {

  private case class Ev(pair: String, day: Int, milli: Long, id: Long)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 22)
    raw <- Gen.listOfN(n, for {
      p <- Gen.oneOf("AAA", "BBB", "CCC")
      d <- Gen.choose(1, 5)
      m <- Gen.choose(900L, 1100L)
    } yield (p, d, m))
  } yield raw.zipWithIndex.map { case ((p, d, m), i) =>
    Ev(p, d, m, i.toLong)
  }

  private def toDf(evs: List[Ev]): DataFrame = {
    import spark.implicits._
    evs.map(e => (e.id, e.pair, e.milli / 1000.0, f"2024-01-0${e.day}"))
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time",
        unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
  }

  // event_time = day-midnight micros + unique id: the (event_time,
  // event_id) total order every argmax property quantifies over
  private def orderKey(e: Ev): (Long, Long) =
    (e.day.toLong * 86400000000L + e.id, e.id)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(10)
        .withInitialSeed(Seed(17L)),
      prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("property: re-ingesting the same payload through the LWW upsert is a no-op") {
    check("upsert idempotence", Prop.forAll(genEvents) { evs =>
      val df = toDf(evs)
      val once = MergeOps.upsertLatest(df,
        Seq("ccy_couple", "date"), Seq(col("event_time"), col("event_id")))
      val twice = MergeOps.upsertLatest(df.unionByName(df),
        Seq("ccy_couple", "date"), Seq(col("event_time"), col("event_id")))
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("event_id"), r.getAs[String]("ccy_couple"))
      once.collect().map(key).toSet == twice.collect().map(key).toSet
    })
  }

  test("property: latest-per-pair equals the (event_time, event_id) argmax") {
    check("latest argmax", Prop.forAll(genEvents) { evs =>
      val got = RateAnalysis.latestPerPair(toDf(evs)).collect()
        .map(r => r.getAs[String]("ccy_couple") -> r.getAs[Long]("event_id"))
        .toMap
      val want = evs.groupBy(_.pair).map { case (p, es) =>
        p -> es.maxBy(orderKey).id
      }
      got == want
    })
  }

  test("property: previous-rate = 2nd-latest before cutoff; window and join+agg forms agree") {
    check("previous rate", Prop.forAll(genEvents, Gen.choose(1, 5)) {
      (evs, cutDay) =>
        val cutoff = to_date(lit(f"2024-01-0$cutDay"))
        val df = toDf(evs)
        val brute = evs.filter(_.day <= cutDay).groupBy(_.pair)
          .flatMap { case (p, es) =>
            es.sortBy(orderKey).reverse.drop(1).headOption
              .map(e => p -> e.id)
          }.toMap
        val native = RateAnalysis.previousRates(df, cutoff).collect()
          .map(r => r.getAs[String]("ccy_couple") ->
            r.getAs[Long]("previous_event_time")).toMap
        val joined = RateAnalysis.previousRatesJoinAgg(df, cutoff).collect()
          .map(r => r.getAs[String]("ccy_couple") ->
            r.getAs[Long]("previous_event_time")).toMap
        // compare on event identity: previous_event_time embeds the id
        val bruteTimes = brute.map { case (p, id) =>
          val e = evs.find(_.id == id).get
          p -> (java.time.LocalDate.of(2024, 1, e.day)
            .toEpochDay * 86400000000L + e.id)
        }
        native == bruteTimes && joined == bruteTimes
    })
  }

  test("property: pct-change equals HALF_UP BigDecimal algebra") {
    import spark.implicits._
    val genPair = for {
      cur <- Gen.choose(800000L, 1200000L) // micro-units, 6 dp
      prev <- Gen.choose(800000L, 1200000L)
    } yield (cur, prev)
    check("pct change", Prop.forAll(Gen.listOfN(8, genPair)) { ps =>
      val df = ps.toDF("cur_u", "prev_u")
        .select((col("cur_u") / 1e6).cast("decimal(10,6)").as("cur"),
          (col("prev_u") / 1e6).cast("decimal(10,6)").as("prev"))
      val got = df.select(
        RateAnalysis.pctChange(col("cur"), col("prev")).as("pc"))
        .collect().map(_.getDecimal(0).toPlainString)
      val want = ps.map { case (c, p) =>
        // mirror Spark's decimal chain: (11,6)/(10,6) divides at scale
        // max(6, s1+p2+1) = 17 HALF_UP, ×100 exact, CAST(28,10) HALF_UP,
        // round(·, 2) HALF_UP
        import java.math.{BigDecimal => JBD, RoundingMode => RM}
        val cur = new JBD(c).movePointLeft(6)
        val prev = new JBD(p).movePointLeft(6)
        cur.subtract(prev).divide(prev, 17, RM.HALF_UP)
          .movePointRight(2)
          .setScale(10, RM.HALF_UP)
          .setScale(2, RM.HALF_UP)
          .toPlainString
      }
      got.toSeq == want
    })
  }
}
