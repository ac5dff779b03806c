package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy KEY matching (record linkage) at edit distance ≤ 1 via FastSS
  * deletion-neighborhood blocking (Bocek et al. 2007, "Fast Similarity
  * Search in Large Dictionaries" — public algorithm): each key emits its
  * deletion neighborhood U(s) = {s} ∪ {s with char i deleted}, and keys
  * within edit distance 1 are guaranteed to share a variant —
  *   - substitution at position i: deleting i from BOTH sides yields the
  *     same string;
  *   - insertion/deletion: the shorter key IS a deletion variant of the
  *     longer, and the shorter's identity variant matches it.
  * So the variant equi-join is COMPLETE for ED ≤ 1; a final
  * `levenshtein` verify removes the false positives the neighborhood
  * admits (e.g. "ab"/"ba" share variants but sit at distance 2).
  *
  * Shape at 100 TB: |U(s)| = len(s)+1 variants per key, candidates come
  * from ONE hash-shuffle equi-join on the 64-bit variant hash — never an
  * all-pairs product (the naive form is O(n²) levenshtein calls; this is
  * O(n·len) rows through one exchange). A hash collision can only ADD a
  * candidate (the verify rejects it), never lose a true pair.
  */
object FuzzyJoin {

  /** All single-char-deletion variants of `c`, plus `c` itself. */
  def deletionNeighborhood(c: Column): Column =
    concat(array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1),
          c.substr(i + lit(1), length(c)))))

  /** Distinct (id_a < id_b) pairs whose `keyCol` values are within edit
    * distance 1. Input ids must be unique per key row.
    */
  def edit1Pairs(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    // candidates travel as BARE id pairs — the key strings would widen
    // the variant explode and the distinct's shuffle ~10×; they rejoin
    // from the base relation only for the final verify
    val base = df.select(col(idCol).as("id"), col(keyCol).as("name"))
    val vars = base
      .select(col("id"), explode(deletionNeighborhood(col("name"))).as("v"))
      .select(col("id"), xxhash64(col("v")).as("vh"))
    val cand = vars
      .join(vars.select(col("vh"), col("id").as("id_b")), Seq("vh"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b")).distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("name").as("name_a")),
        Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("name").as("name_b")),
        Seq("id_b"))
      .where(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("id_a"), col("id_b"))
  }
}
