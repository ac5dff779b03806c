package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.similarity.Similarity
import graft.text.{NearDup, TextFunctions}

class OperatorsSpec extends SparkSuite {

  test("sessionize: 30-minute gap splits sessions, stats are exact") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L, 1.0),
      (2L, t("2024-01-01 10:10:00"), 7L, 2.0),
      (3L, t("2024-01-01 11:30:00"), 7L, 4.0),  // > 30 min gap → new session
      (4L, t("2024-01-01 10:05:00"), 9L, 8.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.sessionStats(ev, "user_id", "ts", 1800L,
      col("event_id"), "value").orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(2) == 2 && out(0).getDouble(5) == 3.0) // user 7 s1
    assert(out(1).getLong(2) == 1 && out(1).getDouble(5) == 4.0) // user 7 s2
    assert(out(2).getLong(2) == 1 && out(2).getDouble(5) == 8.0) // user 9
  }

  test("session paths: ordered assembly, step cap, gap split, frequency rank") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // user 7: 6 events in one session (path capped at 5 steps), then a
    // >30-min gap opens a second session; user 9 contributes a repeat
    // of the common single-step path
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L, "view"),
      (2L, t("2024-01-01 10:01:00"), 7L, "click"),
      (3L, t("2024-01-01 10:02:00"), 7L, "view"),
      (4L, t("2024-01-01 10:03:00"), 7L, "click"),
      (5L, t("2024-01-01 10:04:00"), 7L, "purchase"),
      (6L, t("2024-01-01 10:05:00"), 7L, "error"),   // step 6 — capped off
      (7L, t("2024-01-01 12:00:00"), 7L, "view"),    // new session
      (8L, t("2024-01-01 09:00:00"), 9L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val q = Sessionize.topSessionPaths(ev, "user_id", "ts", 1800L,
      col("event_id"), "event_type")
    val out = q.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out == Map(
      "view" -> ((2L, 1)),                                // 2 sessions, rank 1
      "view>click>view>click>purchase" -> ((1L, 2))))     // capped at 5
    // the step cap is enforced BEFORE the collect: the rn<=maxSteps
    // filter compiles to a WindowGroupLimit, so per-session state in
    // the aggregation buffer is bounded even for bot sessions
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("cosine: identical vectors score 1.0, orthogonal 0.0") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      Similarity.cosine(typedlit(Seq(1.0f, 0.0f)), typedlit(Seq(1.0f, 0.0f))).as("same"),
      Similarity.cosine(typedlit(Seq(1.0f, 0.0f)), typedlit(Seq(0.0f, 2.0f))).as("orth"))
    val r = df.collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("brute-force top-k: k rows per query, ranked by descending similarity") {
    val out = Similarity.bruteForceTopK(spark, sf("sf0.001"), nQueries = 3, k = 5)
    val rows = out.collect()
    assert(rows.length == 15)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(r => r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001))
  }

  test("LshSignature expression == HOF signature bit-for-bit on real embeddings") {
    val ps = Similarity.planes(12, 64)
    val emb = graft.model.Tables.embeddings(spark, sf("sf0.001"))
    val both = emb.select(col("vec_id"),
      Similarity.lshSignature(col("embedding"), ps).as("expr_sig"),
      Similarity.lshSignatureHof(col("embedding"), ps).as("hof_sig"))
    assert(both.where(col("expr_sig") =!= col("hof_sig")).count() == 0)
    // signatures spread across buckets (planes actually separate vectors)
    assert(both.select(col("expr_sig")).distinct().count() > 1)
  }

  test("SignBits: hand patterns, codegen == driver fold, Hamming ranking sane") {
    import spark.implicits._
    // hand vectors: alternating signs → 0b101; zeros are NOT positive
    val hand = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)),
      (2L, Seq(0.0f, -0.0f, -3.0f)),
      (3L, Seq(-1.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = hand.select(col("vec_id"),
      graft.functions.SignBits(col("embedding")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 0L, 3L -> 2L))
    // real embeddings: the codegen'd expression equals a driver fold
    val emb = graft.model.Tables.embeddings(spark, sf("sf0.001"))
    val rows = emb.select(col("vec_id"), col("embedding"),
      graft.functions.SignBits(col("embedding")).as("s")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val expect = v.take(64).zipWithIndex
        .foldLeft(0L) { case (a, (x, i)) => if (x > 0f) a | (1L << i) else a }
      assert(r.getLong(2) == expect)
    }
    assert(rows.map(_.getLong(2)).distinct.length > 1)
    // the binary ranking returns k rows per query, Hamming ascending
    val bt = Similarity.binaryTopK(spark, sf("sf0.001"), nQueries = 3, k = 5)
      .collect()
    assert(bt.length == 15)
    bt.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val hs = rs.sortBy(_.getLong(3)).map(_.getLong(2)).toSeq
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
    }
    // recall is defined and in [0, 1] for every query
    val rc = Similarity.binaryRecall(spark, sf("sf0.001"), nQueries = 3,
      topK = 5).collect()
    assert(rc.length == 3)
    assert(rc.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("minhash signatures: identical texts collide, disjoint texts do not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val sig = NearDup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    assert(sig(1L).length == 32)
  }

  test("simhash: identical docs at Hamming distance 0 from each other") {
    val rep = NearDup.simhashReport(spark, sf("sf0.001"))
    assert(rep.count() == 500)
    // hamming, when present, is bounded by the signature width
    assert(rep.where(col("nn_hamming") > 64).count() == 0)
  }

  test("exact dedup: every doc is its own cluster keeper on a dup-free corpus") {
    val out = TextFunctions.dedupExact(spark, sf("sf0.001"))
    assert(out.count() == 500)
    assert(out.where(!col("is_keeper")).count() == 0)
  }

  test("data-quality gate: single-pass profile and assert semantics") {
    import spark.implicits._
    import graft.operators.DataQuality
    import graft.operators.DataQuality.Rule
    val df = Seq((1, 10.0), (2, -3.0), (3, 5.0)).toDF("id", "v")
    val rules = Seq(Rule("v_positive", col("v") > 0), Rule("id_set", col("id") < 10))
    val p = DataQuality.profile(df, rules).collect().head
    assert(p.getLong(0) == 3 && p.getLong(1) == 1 && p.getLong(2) == 0)
    val err = intercept[IllegalArgumentException] {
      DataQuality.assertAll(df, rules)
    }
    assert(err.getMessage.contains("v_positive=1"))
    DataQuality.assertAll(df.where(col("v") > 0), rules) // clean subset passes
  }

  test("constraint suite: completeness, range, uniqueness, FK on hand-built tables") {
    import spark.implicits._
    import graft.operators.DataQuality._
    // 4 child rows: one null fk (orphan + incomplete), one dangling fk,
    // one duplicate key pair, one value out of range
    val child = Seq(
      (1L, 1, java.lang.Long.valueOf(10L), 5.0),
      (1L, 1, java.lang.Long.valueOf(20L), 60.0), // dup key + out of range
      (2L, 1, null.asInstanceOf[java.lang.Long], 7.0), // null fk
      (3L, 1, java.lang.Long.valueOf(99L), 8.0)) // dangling fk
      .toDF("k1", "k2", "fk", "v")
    val parent = Seq(10L, 20L).toDF("pk")
    val rep = validate(child, Seq(
      Complete("fk_complete", "fk"),
      Satisfies("v_range", col("v").between(0, 50)),
      Unique("key_unique", Seq("k1", "k2")),
      SubsetOf("fk_parent", "fk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(rep("fk_complete") == ((4L, 3L, 0.75, false)))
    assert(rep("v_range") == ((4L, 3L, 0.75, false)))
    assert(rep("key_unique") == ((4L, 3L, 0.75, false)))
    assert(rep("fk_parent") == ((4L, 2L, 0.5, false)))
    // the clean contract passes
    val clean = validate(child.where(col("fk") === 10L), Seq(
      Complete("fk_complete", "fk"),
      SubsetOf("fk_parent", "fk", parent, "pk")))
    assert(clean.collect().forall(_.getBoolean(4)))
    // Unique must count NULL-bearing tuples like SELECT DISTINCT does
    // (struct wrap) — 4 rows, distinct (fk, k2) tuples incl. the null
    // one = 4 → unique even though one key component is NULL
    val uniq = validate(child, Seq(Unique("u", Seq("fk", "k2"))))
      .collect().head
    assert(uniq.getLong(2) == 4L && uniq.getBoolean(4))
  }

  test("constraint partials merge: summed batch counters equal the one-shot counts") {
    import spark.implicits._
    import graft.operators.DataQuality._
    val child = Seq(
      (1L, 1, java.lang.Long.valueOf(10L), 5.0),
      (1L, 1, java.lang.Long.valueOf(20L), 60.0),
      (2L, 1, null.asInstanceOf[java.lang.Long], 7.0),
      (3L, 1, java.lang.Long.valueOf(99L), 8.0))
      .toDF("k1", "k2", "fk", "v")
    val parent = Seq(10L, 20L).toDF("pk")
    val cs = Seq(
      Complete("fk_complete", "fk"),
      Satisfies("v_range", col("v").between(0, 50)),
      SubsetOf("fk_parent", "fk", parent, "pk"))
    // two disjoint batches whose summed partials must equal the one-shot
    val p1 = partialCounters(child.where(col("k1") <= 1), cs).collect().head
    val p2 = partialCounters(child.where(col("k1") > 1), cs).collect().head
    val one = partialCounters(child, cs).collect().head
    (0 until one.length).foreach { i =>
      assert(p1.getLong(i) + p2.getLong(i) == one.getLong(i))
    }
    // and the counter columns agree with validate()'s n_good
    val rep = validate(child, cs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(one.getLong(1) == rep("fk_complete"))
    assert(one.getLong(2) == rep("v_range"))
    assert(one.getLong(3) == rep("fk_parent"))
  }

  test("skyline: dominance semantics, duplicate frontier points, chunk boundaries") {
    import spark.implicits._
    import graft.operators.Skyline
    // frontier: (10, d3) twice (exact duplicates both stay) and (5, d5);
    // dominated: (10, d1) same x lower y; (9, d3) same y lower x;
    // (8, d2) both lower. chunkW = 3 forces the across-chunk path.
    def d(s: String) = java.sql.Date.valueOf(s)
    val pts = Seq(
      (1L, 10.0, d("2024-01-03")), (2L, 10.0, d("2024-01-03")),
      (3L, 10.0, d("2024-01-01")), (4L, 9.0, d("2024-01-03")),
      (5L, 8.0, d("2024-01-02")), (6L, 5.0, d("2024-01-05")))
      .toDF("id", "price", "day")
    val out = Skyline.skylineMax2D(pts, col("price"), col("day"), chunkW = 3.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 6L))
    // invariant vs the quadratic definition on the same frame
    pts.createOrReplaceTempView("__sky_pts")
    val naive = spark.sql(
      """SELECT id FROM __sky_pts o WHERE NOT EXISTS (
        |  SELECT 1 FROM __sky_pts q
        |  WHERE q.price >= o.price AND q.day >= o.day
        |    AND (q.price > o.price OR q.day > o.day))""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(out == naive)
  }

  test("k-anonymity: small equivalence classes flagged, k=1 certifies anything") {
    import spark.implicits._
    import graft.operators.DataQuality
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq(("DE", "A"))).toDF("country", "seg")
    val v = DataQuality.kAnonymityViolations(df, Seq("country", "seg"), 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(v == Map(("US", "B") -> 2L, ("DE", "A") -> 1L))
    assert(DataQuality.kAnonymityViolations(df, Seq("country", "seg"), 1L)
      .count() == 0) // every class has >= 1 row by definition
  }

  test("functional deps: holds/violations exact, NULL dependent is a value") {
    import spark.implicits._
    import graft.operators.DataQuality
    // k→v holds; k→w violated by key 1 (two distinct w) AND by key 2
    // (NULL + 3 — the struct wrap must count the NULL as a value)
    val df = Seq(
      (1L, 10L, java.lang.Long.valueOf(1L)),
      (1L, 10L, java.lang.Long.valueOf(2L)),
      (2L, 20L, null.asInstanceOf[java.lang.Long]),
      (2L, 20L, java.lang.Long.valueOf(3L)),
      (3L, 30L, java.lang.Long.valueOf(4L)))
      .toDF("k", "v", "w")
    val out = DataQuality.functionalDependencies(df,
        Seq("k" -> "v", "k" -> "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("k", "v")) == ((3L, 0L, true)))
    assert(out(("k", "w")) == ((3L, 2L, false)))
  }

  test("drift chi2: hand statistic, thresholds, new-bucket drift") {
    import spark.implicits._
    import graft.operators.DataQuality
    // 5-day span → split = d0 + floor(4/2) = day 3; ref = days 1-2,
    // cur = days 3-5. Ref: 10 rows in bucket 0, 10 in bucket 1.
    // Cur: 5 / 15 → e = (10, 10), chi2 = 25/10 + 25/10 = 5.0 exactly.
    def rows(day: Int, v: Double, n: Int) =
      Seq.fill(n)((v, s"2024-01-0$day 12:00:00"))
    val df = (rows(1, 10.0, 5) ++ rows(2, 10.0, 5) ++
      rows(1, 60.0, 5) ++ rows(2, 60.0, 5) ++
      rows(3, 10.0, 3) ++ rows(5, 10.0, 2) ++
      rows(3, 60.0, 8) ++ rows(5, 60.0, 7))
      .toDF("value", "tss").withColumn("ts", to_timestamp(col("tss")))
    val r = DataQuality.driftChi2(df, "value", "ts").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((20L, 20L, 2L, 0L)))
    assert(r.getDouble(4) == 5.0)
    assert(!r.getBoolean(5)) // 5.0 < 30.14, no new buckets
    assert(DataQuality.driftChi2(df, "value", "ts", threshold = 4.0)
      .collect().head.getBoolean(5))
    // a value class unseen in the reference window is drift by itself
    val withNew = df.unionByName(rows(5, 260.0, 3)
      .toDF("value", "tss").withColumn("ts", to_timestamp(col("tss"))))
    val n = DataQuality.driftChi2(withNew, "value", "ts").collect().head
    assert(n.getLong(3) == 1L && n.getBoolean(5))
  }

  test("drift chi2 incremental: late span-extending batch; equals one-shot") {
    import spark.implicits._
    import graft.operators.DataQuality
    def rows(day: Int, v: Double, n: Int) =
      Seq.fill(n)((v, s"2024-01-0$day 12:00:00"))
    def df(rs: Seq[(Double, String)]) = rs.toDF("value", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).select("value", "ts")
    val all = rows(1, 10.0, 5) ++ rows(2, 10.0, 5) ++ rows(1, 60.0, 5) ++
      rows(2, 60.0, 5) ++ rows(3, 10.0, 3) ++ rows(5, 10.0, 2) ++
      rows(3, 60.0, 8) ++ rows(5, 60.0, 7)
    val counts = graft.util.Scratch.dir("drift_inc").resolve("c").toString
    // batch 1 covers days 1-3 only; the LATE batch extends the span to
    // day 5 and must move the midpoint when the report derives it
    val (b1, b2) = all.partition(_._2 < "2024-01-04")
    DataQuality.appendDriftBatch(spark, counts, df(b1), "value", "ts",
      batchId = Some(0L))
    DataQuality.appendDriftBatch(spark, counts, df(b2), "value", "ts",
      batchId = Some(1L))
    // re-delivery is a no-op
    DataQuality.appendDriftBatch(spark, counts, df(b2), "value", "ts",
      batchId = Some(1L))
    val oneShot = DataQuality.driftChi2(df(all), "value", "ts")
      .collect().head.toSeq
    val fromState = DataQuality.driftChi2FromPartials(spark, counts)
      .collect().head.toSeq
    assert(fromState == oneShot)
    assert(oneShot(4) == 5.0) // the hand statistic from the base fixture
  }

  test("l-diversity: homogeneous classes flagged even when k-anonymous") {
    import spark.implicits._
    import graft.operators.DataQuality
    // class ("US","A"): 5 rows but only 1 sensitive value — k-anonymous
    // at k=3 yet l-DIVERSITY fails (the homogeneity attack); ("US","B")
    // has 3 rows / 3 distinct values and passes at l=2
    val df = (Seq.fill(5)(("US", "A", "cancer")) ++
      Seq(("US", "B", "flu"), ("US", "B", "none"), ("US", "B", "cancer")))
      .toDF("country", "seg", "dx")
    val v = DataQuality.lDiversityViolations(df, Seq("country", "seg"),
        col("dx"), 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(v == Map(("US", "A") -> ((5L, 1L))))
    // yet k-anonymity at k=3 sees nothing wrong with ("US","A")
    assert(!DataQuality.kAnonymityViolations(df, Seq("country", "seg"), 3L)
      .collect().exists(r => r.getString(0) == "US" && r.getString(1) == "A"))
    // l=1 certifies anything non-empty
    assert(DataQuality.lDiversityViolations(df, Seq("country", "seg"),
      col("dx"), 1L).count() == 0)
  }

  test("volume anomaly: the spike day alarms, steady days and warm-up stay quiet") {
    import spark.implicits._
    import graft.operators.DataQuality
    // 9 days at 10 rows/day, day 10 spikes to 100: the zero-variance
    // baseline alarms on any deviation; steady days are a quiet FALSE;
    // days 1-2 have an undefined (<2-day) baseline → NULL
    val rows = (1 to 9).flatMap(d =>
      Seq.fill(10)(java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"))) ++
      Seq.fill(100)(java.sql.Timestamp.valueOf("2024-01-10 12:00:00"))
    val df = rows.toDF("ts")
    val out = DataQuality.volumeAnomaly(df, "ts").collect()
      .map(r => r.getDate(0).toString -> r).toMap
    assert(out.size == 10)
    assert(out("2024-01-10").getBoolean(4))                 // the spike alarms
    assert(out("2024-01-10").getDouble(2) == 10.0)          // baseline mean
    assert(out("2024-01-01").isNullAt(4))                   // no baseline
    assert(out("2024-01-02").isNullAt(4))                   // 1-day baseline
    (3 to 9).foreach { d =>
      assert(!out(f"2024-01-$d%02d").getBoolean(4))         // quiet steady days
    }
  }

  test("skyline merge identity: skyline(skyline(A) ∪ B) = skyline(A ∪ B)") {
    import spark.implicits._
    import graft.operators.Skyline
    // deterministic scattered points (no RNG): the identity is what
    // makes the incremental frontier state correct
    def d(i: Int) = java.sql.Date.valueOf(f"2024-01-${1 + (i * 7) % 28}%02d")
    val pts = (0 until 60).map(i => (i.toLong, ((i * 13) % 41).toDouble, d(i)))
      .toDF("id", "price", "day")
    val (a, b) = (pts.where(col("id") < 30), pts.where(col("id") >= 30))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    val oneShot = ids(Skyline.skylineMax2D(pts, col("price"), col("day"), 10.0))
    val incr = ids(Skyline.skylineMax2D(
      Skyline.skylineMax2D(a, col("price"), col("day"), 10.0).unionByName(b),
      col("price"), col("day"), 10.0))
    assert(incr == oneShot && oneShot.nonEmpty)
  }

  test("recursive closure: seed at hop 0, hops bounded, walks positive") {
    val out = SparkEntry.queries("q_recursive_closure")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out.contains(0L) && out(0L)._1 == 0) // the anchor node
    out.values.foreach { case (minHops, walks) =>
      assert(minHops >= 0 && minHops <= 3) // the recursion guard held
      assert(walks >= 1L)
    }
  }

  test("key-skew profile: hand-built skew reports exact counts and ratios") {
    import spark.implicits._
    import graft.operators.DataQuality
    // key 1: 6 rows; keys 2..5: 1 row each → 10 rows, 5 keys, mean 2,
    // max 6 → share 0.6, skew 3.0
    val df = (Seq.fill(6)(1) ++ Seq(2, 3, 4, 5)).toDF("k")
    val r = DataQuality.keySkewProfile(df, "k").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 5L && r.getLong(2) == 6L)
    assert(r.getDouble(4) == 0.6)
    assert(r.getDouble(5) == 3.0)
    assert(r.getDouble(3) >= 1.0 && r.getDouble(3) <= 6.0) // p99 in range
  }

  test("observe(): in-flight write-path metrics equal the second-scan profile") {
    import graft.operators.DataQuality
    val li = graft.model.Tables.lineitem(spark, sf("sf0.001"))
    val rules = Seq(
      DataQuality.Rule("qty_positive", col("l_quantity") > 0),
      DataQuality.Rule("discount_unit", col("l_discount").between(0, 1)))
    val observed = DataQuality.observedProfile(li, rules) { inst =>
      inst.write.format("noop").mode("overwrite").save()
    }.collect().head.toSeq
    val scanned = DataQuality.profile(li, rules).collect().head.toSeq
    assert(observed == scanned)
  }

  test("boilerplate fractions: corpus-frequent trigram phrases score, rare ones don't") {
    val out = TextFunctions.textBoilerplate(spark, sf("sf0.001"), minDocs = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // every non-null-text doc with >= 3 tokens scores exactly once
    assert(out.nonEmpty)
    out.values.foreach { case (n, b, f) =>
      assert(n > 0 && b >= 0 && b <= n)
      assert(math.abs(f - b.toDouble / n) == 0.0) // exact integer division
    }
    // the synthetic corpus shares phrases: SOME doc must score > 0 at
    // df >= 2, and none can be 100% boilerplate-free corpus-wide unless
    // genuinely unique
    assert(out.values.exists(_._2 > 0))
  }

  test("language scores are non-negative and prediction is total") {
    val out = TextFunctions.textLangId(spark, sf("sf0.001"))
    assert(out.where(col("predicted_lang").isNull).count() == 0)
    assert(out.where(col("s_en") < 0).count() == 0)
  }

  test("canary scan matches a driver recompute; absent canary never fires") {
    val canaries = TextFunctions.DefaultCanaries
    val out = TextFunctions.textCanaryScan(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    val docs = graft.model.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = (for {
      (id, text) <- docs
      (c, ci) <- canaries.zipWithIndex
      n = (text.length - text.replace(c, "").length) / c.length if n > 0
    } yield (id, ci.toLong) -> ((n.toLong, (text.indexOf(c) + 1).toLong))).toMap
    assert(out == expect)
    assert(out.nonEmpty)
    // the GUID canary is the zero branch
    assert(!out.keySet.exists(_._2 == canaries.length - 1L))
  }

  test("gopher rules match a driver recompute; both pass branches live") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it",
      "for", "on")
    val out = TextFunctions.textGopherRules(spark, sf("sf0.001"))
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4),
          r.getLong(5), r.getBoolean(11)))
      }.toMap
    val docs = graft.model.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val tk = text.trim.split("\\s+").toSeq
      val (nWords, meanLen, alphaFrac, nStop, passes) = out(id)
      assert(nWords == tk.size.toLong, s"doc $id n_words")
      assert(meanLen == tk.map(_.length).sum.toDouble / tk.size,
        s"doc $id mean_word_len")
      assert(alphaFrac ==
        tk.count(_.exists(_.isLetter)).toDouble / tk.size,
        s"doc $id alpha_word_frac")
      assert(nStop == tk.count(stop).toLong, s"doc $id n_stopwords")
      val expect = tk.size >= 50 && tk.size <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 && alphaFrac >= 0.8 &&
        nStop >= 2
      assert(passes == expect, s"doc $id passes")
    }
    assert(out.values.exists(_._5) && out.values.exists(!_._5))
  }

  test("benford digits: exact counts, hand-checkable expectation math") {
    import spark.implicits._
    // six amounts: first digits 1,1,1,2,9,9 -> counts {1:3, 2:1, 9:2}
    val df = Seq(BigDecimal("12.50"), BigDecimal("150.00"),
      BigDecimal("1999.99"), BigDecimal("250.00"), BigDecimal("90.10"),
      BigDecimal("9.75")).map(Tuple1(_)).toDF("amt")
      .select(col("amt").cast("decimal(12,2)").as("amt"))
    val out = graft.operators.DataQuality.benfordDigits(df, "amt")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1, 2, 9))
    assert(out(1)._1 == 3L && out(2)._1 == 1L && out(9)._1 == 2L)
    // same arithmetic the operator pins: expected = n * p, term = dev^2/e
    def check(d: Int, nObs: Long, p: Double): Unit = {
      val e = 6.0 * p
      val t = (nObs.toDouble - e) * (nObs.toDouble - e) / e
      assert(out(d)._2 == e && out(d)._3 == t)
    }
    check(1, 3L, 0.3010299956639812)
    check(2, 1L, 0.17609125905568124)
    check(9, 2L, 0.04575749056067514)
  }

  test("KS drift: exact integer CDF-gap maximum on a hand split") {
    import java.sql.Timestamp
    import spark.implicits._
    // ref = {1,2,3,4} (days 1-4), cur = {3,4,5,5,6,7} (days 9-10;
    // midpoint = day 1 + 9//2 = day 5). Integer CDF gaps |ca·6 − cb·4|:
    // v=1:6, v=2:12, v=3:14, v=4:|24−8|=16 ← max, v=5:8, v=6:4, v=7:0
    val rows = Seq(
      (1.0, "2024-01-01"), (2.0, "2024-01-02"), (3.0, "2024-01-03"),
      (4.0, "2024-01-04"),
      (5.0, "2024-01-09"), (3.0, "2024-01-09"), (4.0, "2024-01-09"),
      (5.0, "2024-01-10"), (6.0, "2024-01-10"), (7.0, "2024-01-10"))
      .map { case (v, d) => (v, Timestamp.valueOf(d + " 00:00:00")) }
      .toDF("value", "ts")
    val out = graft.operators.DataQuality.ksDrift(rows, "value", "ts")
      .collect().head
    // midpoint: d0 + (9/2 → 4) = 2024-01-05 → the four January-1..4
    // rows are the reference sample
    assert((out.getLong(0), out.getLong(1)) == ((4L, 6L)))
    assert(out.getLong(2) == 16L)
    assert(out.getDouble(3) == 16.0 / 24.0)
  }

  test("classifier AUC: the doubled-U handles ties exactly") {
    // directly exercise the rank arithmetic the gate composes: margins
    // pos {3, 1}, neg {1, 0} → pairs: (3>1)+(3>0)+(1=1 half)+(1>0)
    // → U = 3.5, 2U = 7, AUC = 7/8
    import spark.implicits._
    val sc = Seq((3L, 1L), (1L, 1L), (1L, 0L), (0L, 0L)).toDF("m", "y")
    val g = sc.groupBy(col("m"))
      .agg(sum(col("y")).as("p"), (count(lit(1)) - sum(col("y"))).as("q"))
    val w = g.withColumn("below",
      sum(col("q")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("m"))) - col("q"))
    val r = w.agg(sum(col("p") * (lit(2L) * col("below") + col("q")))
      .as("u2")).collect().head
    assert(r.getLong(0) == 7L)
  }

  test("readability: counts and integer milli-grade match a driver recompute") {
    val docs = graft.model.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextFunctions.readability(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    var bands = Set.empty[String]
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val words = "\\S+".r.findAllIn(text).size.toLong
      val sents = math.max("[.!?]+".r.findAllIn(text).size, 1).toLong
      val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).size.toLong
      assert(r.getLong(1) == words && r.getLong(2) == sents &&
        r.getLong(3) == syll)
      val grade = (390L * words) / sents + (11800L * syll) / words - 15590L
      assert(r.getLong(4) == grade)
      val band = if (grade < 6000) "elementary" else if (grade < 9000) "middle"
        else if (grade < 13000) "high_school" else "college"
      assert(r.getString(5) == band)
      bands += band
    }
    // zero-word docs are dropped, never divided by
    assert(out.length == docs.count(_._2.trim.nonEmpty))
    assert(bands.nonEmpty)
  }
}
