package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Pins the FastSS deletion-neighborhood fuzzy join against brute-force
  * levenshtein ground truth: completeness over substitutions, insertions
  * and deletions; rejection of the neighborhood's false positives
  * (transpositions, distance-2 edits); and the no-cartesian plan shape.
  */
class FuzzyJoinSpec extends SparkSuite {

  import spark.implicits._

  // substitution (cat~bat), deletion (cat~at), insertion (cat~cart),
  // transposition at ED 2 (ab~ba shares variants — must be rejected),
  // distance-2 (kitten~bitter), long keys one substitution apart and
  // two substitutions apart
  private val keys = Seq(
    1L -> "cat", 2L -> "bat", 3L -> "at", 4L -> "cart",
    5L -> "ab", 6L -> "ba", 7L -> "dog",
    8L -> "kitten", 9L -> "bitter",
    10L -> "Customer#000000012", 11L -> "Customer#000000013",
    12L -> "Customer#000000099")

  private lazy val df = keys.toDF("id", "name")

  test("pairs equal brute-force levenshtein <= 1 ground truth") {
    val got = FuzzyJoin.edit1Pairs(df, "id", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = df.select(col("id").as("id_b"), col("name").as("name_b"))
    val want = df.join(b, col("id") < col("id_b"))
      .where(levenshtein(col("name"), col("name_b")) <= 1)
      .select(col("id"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // the fixture exercises every class: sub, del, ins present...
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L))
      && want.contains((1L, 4L)) && want.contains((10L, 11L)))
    // ...and the ED-2 shapes (shared-variant transposition, digit swap
    // two positions apart) are absent
    assert(!got.contains((5L, 6L)) && !got.contains((8L, 9L))
      && !got.contains((10L, 12L)))
  }

  test("candidate generation is a hash equi-join, never a cross product") {
    val plan = FuzzyJoin.edit1Pairs(df, "id", "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
