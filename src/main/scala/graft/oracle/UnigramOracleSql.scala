package graft.oracle

/** DuckDB replay of the ENTIRE unigram-LM tokenizer training loop
  * (graft.text.UnigramLm) — the ClassifierOracleSql discipline: the
  * oracle re-runs training itself, so the gate checks the learned
  * artifact, not a copied constant. The engine's linear Viterbi fold
  * (state = best at the last MaxPieceLen positions) unrolls here as
  * MaxWordLen chained MATERIALIZED CTEs per EM iteration (the k-core
  * unrolled-rounds lesson: without MATERIALIZED, CTE inlining explodes
  * exponentially); candidate evaluation is longest-piece-first with
  * strict-better replacement, CASE for CASE the engine's `better`
  * chain, and every score is integer bit-length arithmetic — nothing
  * for either engine to round.
  */
object UnigramOracleSql {

  private val MaxWordLen = 16
  private val MaxPieceLen = 4
  private val SeedMultis = 150
  private val KeepMultis = 100
  private val Iters = 3
  private val Inf = "CAST(1000000000000000 AS BIGINT)"

  private def invalid =
    s"{'c': $Inf, 'np': CAST(0 AS BIGINT), 'seg': ''}"

  /** cand(k) over the pre-joined cost columns p{k}.cost at position i:
    * extend the best at position i−(k+1) with the (k+1)-char piece.
    */
  // NOTE: these fragments are interpolated into an OUTER stripMargin
  // string, so no generated line may begin with '|' (a leading '||'
  // concat operator would be eaten as a margin pipe)
  private def cand(i: Int, k: Int): String = {
    val piece = s"substr(d.word, ${i - k}, ${k + 1})"
    val prev = s"d.s$k"
    s"""CASE WHEN struct_extract($prev, 'c') < $Inf
       |          AND p$k.cost IS NOT NULL
       |     THEN {'c': struct_extract($prev, 'c') + p$k.cost,
       |           'np': struct_extract($prev, 'np') + CAST(1 AS BIGINT),
       |           'seg': CASE WHEN struct_extract($prev, 'seg') = ''
       |                       THEN $piece
       |                       ELSE concat(struct_extract($prev, 'seg'),
       |                            '~BAR~', $piece) END}
       |     ELSE $invalid END""".stripMargin
      .replace("~BAR~", "|")
  }

  /** Strict-better on (cost, n_pieces): b replaces a only when strictly
    * smaller, so the longest-first chain keeps the longest piece on
    * ties — the engine's tiebreak.
    */
  private def better(a: String, b: String): String =
    s"""CASE WHEN struct_extract($b, 'c') < struct_extract($a, 'c')
       |       OR (struct_extract($b, 'c') = struct_extract($a, 'c')
       |           AND struct_extract($b, 'np') < struct_extract($a, 'np'))
       |     THEN $b ELSE $a END""".stripMargin

  /** One EM iteration's DP chain + segmentation + usage CTEs. */
  private def dpCtes(t: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s""", dp${t}_0 AS MATERIALIZED (
         |  SELECT word, freq, length(word) AS len,
         |    {'c': CAST(0 AS BIGINT), 'np': CAST(0 AS BIGINT), 'seg': ''} AS s0,
         |    $invalid AS s1, $invalid AS s2, $invalid AS s3
         |  FROM wtc
         |)""".stripMargin)
    for (i <- 1 to MaxWordLen) {
      val ks = (math.min(MaxPieceLen - 1, i - 1) to 0 by -1).toSeq
      val joins = ks.map(k =>
        s"  LEFT JOIN c$t p$k ON p$k.piece = substr(d.word, ${i - k}, ${k + 1})")
        .mkString("\n")
      val candCols = ks.map(k => s"      ${cand(i, k)} AS k$k").mkString(",\n")
      val best = ks.map(k => s"k$k").reduceLeft((a, b) => better(a, b))
      sb.append(
        s""", dp${t}_$i AS MATERIALIZED (
           |  SELECT word, freq, len,
           |    CASE WHEN $i <= len THEN $best ELSE s0 END AS s0,
           |    CASE WHEN $i <= len THEN s0 ELSE s1 END AS s1,
           |    CASE WHEN $i <= len THEN s1 ELSE s2 END AS s2,
           |    CASE WHEN $i <= len THEN s2 ELSE s3 END AS s3
           |  FROM (
           |    SELECT d.word, d.freq, d.len, d.s0, d.s1, d.s2, d.s3,
           |$candCols
           |    FROM dp${t}_${i - 1} d
           |$joins
           |  )
           |)""".stripMargin)
    }
    sb.append(
      s""", seg$t AS MATERIALIZED (
         |  SELECT word, freq, struct_extract(s0, 'seg') AS seg,
         |    struct_extract(s0, 'np') AS n_tokens,
         |    struct_extract(s0, 'c') AS total_cost
         |  FROM dp${t}_$MaxWordLen
         |), usage$t AS MATERIALIZED (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(string_split(seg, '|')) AS piece
         |    FROM seg$t)
         |  GROUP BY piece
         |)""".stripMargin)
    sb.toString
  }

  /** Costs for iteration t from the (piece, cnt) digest v{t}. */
  private def costCte(t: Int): String =
    s""", c$t AS MATERIALIZED (
       |  SELECT piece,
       |    CAST(length(bin(CAST(t.total AS BIGINT)))
       |      - length(bin(greatest(cnt, 1))) + 1 AS BIGINT) AS cost
       |  FROM v$t, (SELECT sum(cnt) AS total FROM v$t) t
       |)""".stripMargin

  /** Prune: keep every single character (usage or 0) plus the top
    * KeepMultis multi-char pieces by (usage desc, piece asc).
    */
  private def pruneCte(t: Int): String =
    s""", v${t + 1} AS MATERIALIZED (
       |  SELECT v.piece, coalesce(u.cnt, CAST(0 AS BIGINT)) AS cnt
       |  FROM v$t v LEFT JOIN usage$t u ON u.piece = v.piece
       |  WHERE length(v.piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM usage$t
       |    WHERE length(piece) > 1 AND cnt > 0
       |    ORDER BY cnt DESC, piece ASC LIMIT $KeepMultis)
       |)""".stripMargin

  /** The shared training chain: word types → seed → Iters EM rounds. */
  private def trainingCtes(maxWords: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""wtc AS MATERIALIZED (
         |  SELECT word, freq FROM (
         |    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
         |      FROM documents)
         |    WHERE regexp_matches(word, '^[a-z]+$$')
         |    GROUP BY word ORDER BY freq DESC, word ASC LIMIT $maxWords)
         |  WHERE length(word) <= $MaxWordLen
         |), useed AS MATERIALIZED (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(flatten(list_transform(
         |      range(1, length(word) + 1), i -> list_transform(
         |        range(1, least($MaxPieceLen, length(word) - i + 1) + 1),
         |        l -> substr(word, CAST(i AS INT), CAST(l AS INT))))))
         |      AS piece
         |    FROM wtc)
         |  GROUP BY piece
         |), v1 AS MATERIALIZED (
         |  SELECT piece, cnt FROM useed WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM useed WHERE length(piece) > 1
         |    ORDER BY cnt DESC, piece ASC LIMIT $SeedMultis)
         |)""".stripMargin)
    for (t <- 1 to Iters) {
      sb.append(costCte(t))
      sb.append(dpCtes(t))
      if (t < Iters) sb.append(pruneCte(t))
    }
    sb.toString
  }

  /** The full training chain for composition into other oracles (the
    * tokenizer-stats gate): exposes `wtc` (capped word types) and
    * `seg3` (the final round's segmentations).
    */
  def ctes(maxWords: Int = 2000): String = trainingCtes(maxWords)

  /** cur_unigram_vocab: the learned (piece, n_used, cost) artifact. */
  def vocabSql(maxWords: Int = 2000): String =
    s"""WITH ${trainingCtes(maxWords)}
       |SELECT v.piece, coalesce(u.cnt, CAST(0 AS BIGINT)) AS n_used,
       |  c.cost
       |FROM v$Iters v
       |JOIN c$Iters c ON c.piece = v.piece
       |LEFT JOIN usage$Iters u ON u.piece = v.piece""".stripMargin

  /** cur_unigram_tokenize: Viterbi inference under the final costs —
    * the last EM round's segmentation IS the inference pass.
    */
  def tokenizeSql(maxWords: Int = 2000): String =
    s"""WITH ${trainingCtes(maxWords)}
       |SELECT word, seg, n_tokens, total_cost FROM seg$Iters""".stripMargin
}
