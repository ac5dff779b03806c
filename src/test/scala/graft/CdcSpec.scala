package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Snapshot-diff semantics: every change class (insert, update, delete),
  * null-safe value comparison (NULL→value and value→NULL are updates,
  * NULL→NULL is unchanged), unchanged keys dropped.
  */
class CdcSpec extends SparkSuite {

  test("snapshotDiff classifies inserts, updates, deletes; null-safe compare") {
    import spark.implicits._
    val old = Seq[(String, Option[Double])](
      ("k1", Some(1.0)),  // unchanged → dropped
      ("k2", Some(2.0)),  // updated
      ("k3", Some(3.0)),  // deleted
      ("k5", None),       // NULL → value: update
      ("k6", None)        // NULL → NULL: unchanged → dropped
    ).toDF("k", "v")
    val nw = Seq[(String, Option[Double])](
      ("k1", Some(1.0)),
      ("k2", Some(2.5)),
      ("k4", Some(4.0)),  // inserted
      ("k5", Some(5.0)),
      ("k6", None)
    ).toDF("k", "v")

    val got = Cdc.snapshotDiff(old, nw, Seq("k"), Seq("v")).collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)),
        r.getString(3))).toMap
    assert(got.keySet == Set("k2", "k3", "k4", "k5"))
    assert(got("k2") == (Some(2.0), Some(2.5), "update"))
    assert(got("k3") == (Some(3.0), None, "delete"))
    assert(got("k4") == (None, Some(4.0), "insert"))
    assert(got("k5") == (None, Some(5.0), "update"))
  }

  test("applying the diff to the old snapshot reproduces the new one") {
    import spark.implicits._
    val old = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("k", "v")
    val nw = Seq(("a", 1.0), ("b", 9.0), ("d", 4.0)).toDF("k", "v")
    val diff = Cdc.snapshotDiff(old, nw, Seq("k"), Seq("v"))
    val applied =
      old.join(diff.select(col("k")), Seq("k"), "left_anti") // drop touched
        .unionByName(diff.where(col("change_type") =!= "delete")
          .select(col("k"), col("new_v").as("v")))           // add new state
    assert(applied.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      == nw.collect().map(r => (r.getString(0), r.getDouble(1))).toSet)
  }

  test("applyChangelog reconstructs any historical state, deletes included") {
    import spark.implicits._
    // a 3-batch changelog for one key universe: insert → update+insert →
    // delete (columns shaped like snapshotDiff output + cdc_batch)
    val log = Seq(
      ("a", None, Some(1.0), "insert", 0L),
      ("b", None, Some(2.0), "insert", 0L),
      ("a", Some(1.0), Some(1.5), "update", 1L),
      ("c", None, Some(3.0), "insert", 1L),
      ("b", Some(2.0), None, "delete", 2L))
      .toDF("k", "old_v", "new_v", "change_type", "cdc_batch")
    def state(b: Long) = Cdc.applyChangelog(log, Seq("k"), Seq("v"), Some(b))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state(0L) == Map("a" -> 1.0, "b" -> 2.0))
    assert(state(1L) == Map("a" -> 1.5, "b" -> 2.0, "c" -> 3.0))
    assert(state(2L) == Map("a" -> 1.5, "c" -> 3.0)) // b deleted
    // unbounded = the current table
    val full = Cdc.applyChangelog(log, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(full == state(2L))
  }
}
