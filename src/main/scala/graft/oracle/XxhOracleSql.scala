package graft.oracle

/** DuckDB-SQL replay of Spark's XXH64 hash family, used to give the
  * MinHash-LSH and SimHash near-dup reports REAL value-checked oracles
  * (they were the gate's last two rows-only entries).
  *
  * The whole xxhash64 family — byte-string hash (with the 4-lane stripe
  * phase for inputs >= 32 bytes), the 8-byte-primitive `hashLong`, the
  * 4-byte `hashInt`, and Spark's multi-argument left-fold — is emitted as
  * single-statement DuckDB SQL over HUGEINT arithmetic in [0, 2^64):
  *
  *  - mod-2^64 multiply: HUGEINT is signed 128-bit, so a*b with both
  *    operands < 2^64 can overflow. Every multiply here is by a known
  *    prime constant, so it is decomposed as a*c = a*(c - 2^63) +
  *    (a&1)<<63 when c >= 2^63 — a*(c-2^63) < 2^127 always fits.
  *  - shifts/masks use HUGEINT `>>`/`<<`/`&` (4-8x cheaper than `%`/`//`,
  *    which are 128-bit divisions — measured 27s -> 4s on the full
  *    minhash oracle at sf0.01).
  *  - xor() on HUGEINT is bitwise on two's-complement 128-bit, which for
  *    values < 2^64 equals 64-bit xor.
  *  - per-row sequential hash phases are CHAINED CTE COLUMN STEPS (one
  *    new column per mixing step), keeping everything vectorized; lambda
  *    `list_reduce` folds appear only where length varies per row (the
  *    stripe/word/byte loops of the byte hash).
  *
  * Byte access comes out of the UTF-8 blob as hex pairs (the technique
  * proven by the `text_rolling_fingerprint` / `mm_features` oracles).
  * Signed Java semantics (the signature slots are signed longs and the
  * min is a signed min) are recovered by converting the unsigned residue
  * at exactly the points the Spark side compares or emits values.
  *
  * Every emitted building block is pinned against Spark ground truth by
  * XxhOracleSqlSpec (spark.sql xxhash64 vs the DuckDB semantics replayed
  * in Scala); the end-to-end reports hash-match the Python/DuckDB
  * cross-validation and ultimately the driver's gate.
  */
object XxhOracleSql {

  private val W = BigInt(1) << 64
  private val M64 = "18446744073709551615" // 2^64 - 1 mask
  private val H63 = BigInt(1) << 63
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Seed = BigInt(42) // Spark's xxhash64 default seed

  /** a*c mod 2^64 for a in [0,2^64) (SQL expr) and constant c < 2^64. */
  private def mulc(a: String, c: BigInt): String =
    if (c < H63) s"(($a*$c) & $M64)"
    else s"(((($a*${c - H63}) & $M64) + (($a&1) << 63)) & $M64)"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"((($x & ${lo - 1}) << $r) + ($x >> ${64 - r}))"
  }

  private def xor(a: String, b: String): String = s"xor($a,$b)"
  private def add(a: String, b: String): String = s"((($a+$b)) & $M64)"

  /** let-binding via single-element list_transform (for inside folds,
    * where intermediates can't be CTE columns): keeps generated text
    * linear instead of exponentially duplicated.
    */
  private def let(bindings: Seq[(String, String)], body: String): String =
    bindings.foldRight(body) { case ((n, e), b) =>
      s"list_transform([$e], $n -> $b)[1]"
    }

  /** XXH64 finalization avalanche as column steps ending at `${pfx}x`. */
  private def fmixSteps(h: String, pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}f1" -> xor(h, s"($h >> 33)"),
    s"${pfx}f2" -> mulc(s"${pfx}f1", P2),
    s"${pfx}f3" -> xor(s"${pfx}f2", s"(${pfx}f2 >> 29)"),
    s"${pfx}f4" -> mulc(s"${pfx}f3", P3),
    s"${pfx}x" -> xor(s"${pfx}f4", s"(${pfx}f4 >> 32)"))

  /** Spark XXH64.hashLong(inp, seed) as column steps ending at `${pfx}x`;
    * inp/seed are column refs holding unsigned HUGEINT in [0,2^64).
    */
  private def hashLongSteps(inp: String, seed: String,
      pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}g0" -> s"(($seed + ${P5 + 8}) & $M64)",
    s"${pfx}k1" -> mulc(inp, P2),
    s"${pfx}k2" -> mulc(rotl(s"${pfx}k1", 31), P1),
    s"${pfx}g1" -> xor(s"${pfx}g0", s"${pfx}k2"),
    s"${pfx}g2" -> add(mulc(rotl(s"${pfx}g1", 27), P1), P4.toString)) ++
    fmixSteps(s"${pfx}g2", pfx)

  /** Spark XXH64.hashInt(inp, seed): inp nonneg < 2^32, so inp*P1 < 2^96
    * fits HUGEINT directly with no constant split.
    */
  private def hashIntSteps(inp: String, seed: String,
      pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}g0" -> s"(($seed + ${P5 + 4}) & $M64)",
    s"${pfx}g1" -> xor(s"${pfx}g0", s"((CAST($inp AS HUGEINT)*$P1) & $M64)"),
    s"${pfx}g2" -> add(mulc(rotl(s"${pfx}g1", 23), P2), P3.toString)) ++
    fmixSteps(s"${pfx}g2", pfx)

  /** LIST(HUGEINT) of UTF-8 bytes from a hex(encode(...)) column. */
  private def byteList(hx: String, ln: String): String =
    s"list_transform(range(0, $ln), j -> CAST(" +
      s"16*(strpos('0123456789ABCDEF', substring($hx, 2*j+1, 1))-1)" +
      s" + strpos('0123456789ABCDEF', substring($hx, 2*j+2, 1))-1 AS HUGEINT))"

  /** Little-endian word from LIST var bs at 0-based offset expr o. */
  private def word(bs: String, o: String, n: Int): String =
    (0 until n).map(k => s"$bs[$o+${k + 1}]*${BigInt(1) << (8 * k)}")
      .mkString("(", " + ", ")")

  /** Spark XXH64.hashUnsafeBytes over columns bs (LIST(HUGEINT)) and ln
    * (BIGINT), as column steps ending at col `xh`. Structure mirrors the
    * Java original: 4-lane 32-byte stripes (length >= 32), then 8-byte
    * words, one optional 4-byte word, trailing bytes, fmix.
    */
  private def hashBytesSteps(): Seq[(String, String)] = {
    val vInit = Seq((Seed + P1 + P2) mod W, (Seed + P2) mod W, Seed mod W,
      (Seed - P1) mod W)
    def lane(v: String, k: String) = mulc(rotl(add(v, mulc(k, P2)), 31), P1)
    val stripes = "list_transform(range(0, ln//32), si -> " +
      s"[${word("bs", "(si*32)", 8)}, ${word("bs", "(si*32+8)", 8)}, " +
      s"${word("bs", "(si*32+16)", 8)}, ${word("bs", "(si*32+24)", 8)}])"
    val stripeFold =
      s"list_reduce(list_prepend([${vInit.mkString(",")}]::HUGEINT[], $stripes), " +
        s"(ac, st) -> [${lane("ac[1]", "st[1]")}, ${lane("ac[2]", "st[2]")}, " +
        s"${lane("ac[3]", "st[3]")}, ${lane("ac[4]", "st[4]")}])"
    def mergeOne(h: String, v: String) =
      add(mulc(xor(h, mulc(rotl(mulc(v, P2), 31), P1)), P1), P4.toString)
    val merge = let(Seq(
      "m0" -> s"(((${rotl("ac[1]", 1)} + ${rotl("ac[2]", 7)} + ${rotl("ac[3]", 12)} + ${rotl("ac[4]", 18)})) & $M64)",
      "m1" -> mergeOne("m0", "ac[1]"),
      "m2" -> mergeOne("m1", "ac[2]"),
      "m3" -> mergeOne("m2", "ac[3]")), mergeOne("m3", "ac[4]"))
    val wordStep = let(
      Seq("w1" -> xor("ac", mulc(rotl(mulc("wk", P2), 31), P1))),
      add(mulc(rotl("w1", 27), P1), P4.toString))
    val byteStep = mulc(rotl(xor("ac", mulc("bb", P5)), 11), P1)
    val four = let(
      Seq("q1" -> xor("h2", mulc(word("bs", "(ln - ln%8)", 4), P1))),
      add(mulc(rotl("q1", 23), P2), P3.toString))
    Seq(
      "h0" -> (s"CASE WHEN ln >= 32 THEN list_transform([$stripeFold], ac -> $merge)[1] " +
        s"ELSE ${(Seed + P5) mod W} END"),
      "h1" -> s"((h0 + ln) & $M64)",
      "h2" -> (s"list_reduce(list_prepend(h1, list_transform(range((ln//32)*32, ln-7, 8), " +
        s"wo -> ${word("bs", "wo", 8)})), (ac, wk) -> $wordStep)"),
      "h3" -> s"CASE WHEN ln%8 >= 4 THEN $four ELSE h2 END",
      "h4" -> s"list_reduce(list_prepend(h3, bs[(ln - ln%4)+1 : ln]), (ac, bb) -> $byteStep)") ++
      fmixSteps("h4", "hb") :+ ("xh" -> "hbx")
  }

  /** Chain steps as CTEs: each adds one column on top of the previous
    * (SELECT * keeps intermediates visible; DuckDB prunes unused ones).
    */
  private def chain(baseName: String, steps: Seq[(String, String)],
      prefix: String): (Seq[String], String) = {
    val named = steps.zipWithIndex.map { case ((n, e), i) =>
      (s"$prefix$i", s"$prefix$i AS (SELECT *, $e AS $n FROM " +
        s"${if (i == 0) baseName else s"$prefix${i - 1}"})")
    }
    (named.map(_._2), if (named.isEmpty) baseName else named.last._1)
  }

  /** Unsigned HUGEINT in [0,2^64) from a signed BIGINT expr. */
  private def toU(v: String): String =
    s"CAST(CASE WHEN $v < 0 THEN $v + 18446744073709551616::HUGEINT ELSE CAST($v AS HUGEINT) END AS HUGEINT)"

  /** Signed BIGINT from an unsigned HUGEINT expr in [0,2^64). */
  private def toS(v: String): String =
    s"CAST(CASE WHEN $v >= 9223372036854775808::HUGEINT THEN $v - 18446744073709551616::HUGEINT ELSE $v END AS BIGINT)"

  /** Canonical text + shingle/token base CTEs shared by both oracles. */
  private val canonCte =
    """d0 AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |       FROM documents WHERE text IS NOT NULL)""".stripMargin

  /** Oracle for NearDup.minhashLsh: 3-word-shingle signatures (32 seeded
    * minhashes), 8 band keys via Spark's multi-arg xxhash64 fold, the
    * bucket-capped candidate self-join, and the per-doc best-neighbor
    * report — all replayed value-exactly.
    */
  /** The CTE chain (no WITH, no canonCte) from tokenization through the
    * capped band-bucket candidate pairs `cp` — shared by the full report
    * oracle and the recall oracle.
    */
  private def minhashCandidateChain(maxBucket: Int): String = {
    val (hbCtes, hbLast) = chain("b2", hashBytesSteps(), "hs")
    val (hlCtes, hlLast) = chain(hbLast, hashLongSteps("xh", "42::HUGEINT", "L"), "cl")
    val (hiCtes, hiLast) = chain("jx", hashIntSteps("j", "hseed", "I"), "ci")
    val (baCtes, baLast) = chain("bw", hashIntSteps("band", "42::HUGEINT", "A"), "ca")
    val (b0Ctes, b0Last) = chain("a0", hashLongSteps("u0", "acc0", "B"), "cb")
    val (b1Ctes, b1Last) = chain("a1", hashLongSteps("u1", "acc1", "C"), "cc")
    val (b2Ctes, b2Last) = chain("a2", hashLongSteps("u2", "acc2", "D"), "cd")
    val (b3Ctes, b3Last) = chain("a3", hashLongSteps("u3", "acc3", "E"), "ce")
    s"""tk AS (SELECT doc_id, nt, str_split(nt, ' ') AS toks FROM d0),
       |se AS (SELECT doc_id, nt, toks, unnest(range(0, CASE WHEN len(toks) >= 3 THEN len(toks)-2 ELSE 1 END)) AS s FROM tk),
       |sg0 AS (SELECT doc_id, s, CASE WHEN len(toks) >= 3 THEN array_to_string(toks[s+1:s+3], ' ') ELSE nt END AS sg FROM se),
       |sg1 AS (SELECT doc_id, s, hex(encode(sg)) AS hx, octet_length(encode(sg)) AS ln FROM sg0),
       |b2 AS (SELECT doc_id, s, ln, ${byteList("hx", "ln")} AS bs FROM sg1),
       |${hbCtes.mkString(",\n")},
       |${hlCtes.mkString(",\n")},
       |hsd AS (SELECT doc_id, Lx AS hseed FROM $hlLast),
       |jx AS (SELECT doc_id, hseed, unnest(range(0, 32)) AS j FROM hsd),
       |${hiCtes.mkString(",\n")},
       |sig AS (SELECT doc_id, j, min(${toS("Ix")}) AS sg FROM $hiLast GROUP BY doc_id, j),
       |bp AS (SELECT doc_id, j // 4 AS band, j % 4 AS slot, sg FROM sig),
       |bw AS (SELECT doc_id, band,
       |       ${toU("max(CASE WHEN slot = 0 THEN sg END)")} AS u0,
       |       ${toU("max(CASE WHEN slot = 1 THEN sg END)")} AS u1,
       |       ${toU("max(CASE WHEN slot = 2 THEN sg END)")} AS u2,
       |       ${toU("max(CASE WHEN slot = 3 THEN sg END)")} AS u3
       |       FROM bp GROUP BY doc_id, band),
       |${baCtes.mkString(",\n")},
       |a0 AS (SELECT doc_id, band, u0, u1, u2, u3, Ax AS acc0 FROM $baLast),
       |${b0Ctes.mkString(",\n")},
       |a1 AS (SELECT doc_id, band, u1, u2, u3, Bx AS acc1 FROM $b0Last),
       |${b1Ctes.mkString(",\n")},
       |a2 AS (SELECT doc_id, band, u2, u3, Cx AS acc2 FROM $b1Last),
       |${b2Ctes.mkString(",\n")},
       |a3 AS (SELECT doc_id, band, u3, Dx AS acc3 FROM $b2Last),
       |${b3Ctes.mkString(",\n")},
       |bk AS (SELECT doc_id, band, ${toS("Ex")} AS key FROM $b3Last),
       |okb AS (SELECT band, key FROM bk GROUP BY band, key HAVING count(*) <= $maxBucket),
       |pr AS (SELECT b.doc_id, b.band, b.key FROM bk b JOIN okb USING (band, key)),
       |cp AS (SELECT DISTINCT a.doc_id, b.doc_id AS nb_id FROM pr a JOIN pr b USING (band, key) WHERE a.doc_id <> b.doc_id)""".stripMargin
  }

  def minhashLsh(maxBucket: Int = 50): String =
    s"""WITH $canonCte,
       |${minhashCandidateChain(maxBucket)},
       |cj AS (SELECT c.doc_id, c.nb_id, sum(CASE WHEN sa.sg = sb.sg THEN 1 ELSE 0 END) AS eq
       |       FROM cp c JOIN sig sa ON sa.doc_id = c.doc_id JOIN sig sb ON sb.doc_id = c.nb_id AND sb.j = sa.j
       |       GROUP BY c.doc_id, c.nb_id),
       |cand AS (SELECT doc_id, nb_id, CAST(eq AS DOUBLE)/32 AS est_jaccard FROM cj),
       |best AS (SELECT doc_id, nb_id, est_jaccard FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY est_jaccard DESC, nb_id ASC) rn FROM cand) WHERE rn = 1),
       |nc AS (SELECT doc_id, count(*) AS n_candidates FROM cand GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(n.n_candidates, 0) AS n_candidates, b.nb_id, b.est_jaccard
       |FROM documents d LEFT JOIN nc n USING (doc_id) LEFT JOIN best b USING (doc_id)""".stripMargin

  /** Oracle for NearDup.simhashReport: per-token xxhash64, sign-of-bit-sum
    * 64-bit signature, 16-bit-chunk bucket-capped candidates, Hamming
    * nearest neighbor.
    */
  /** The CTE chain (no WITH, no canonCte) from tokenization through the
    * capped chunk-bucket candidate pairs `cp`.
    */
  private def simhashCandidateChain(maxBucket: Int): String = {
    val (hbCtes, hbLast) = chain("b2", hashBytesSteps(), "hs")
    s"""tt AS (SELECT doc_id, unnest(str_split(nt, ' ')) AS tok FROM d0),
       |tb AS (SELECT doc_id, hex(encode(tok)) AS hx, octet_length(encode(tok)) AS ln FROM tt),
       |b2 AS (SELECT doc_id, ln, ${byteList("hx", "ln")} AS bs FROM tb),
       |${hbCtes.mkString(",\n")},
       |bx AS (SELECT doc_id, xh, unnest(range(0, 64)) AS j FROM $hbLast),
       |bsum AS (SELECT doc_id, j, sum(CASE WHEN ((xh >> CAST(j AS INTEGER)) & 1) = 1 THEN 1 ELSE -1 END) AS s
       |         FROM bx GROUP BY doc_id, j),
       |sg0 AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::HUGEINT << CAST(j AS INTEGER)) ELSE 0::HUGEINT END) AS su0
       |        FROM bsum GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST(coalesce(su0, 0) AS HUGEINT) AS su, ${toS("CAST(coalesce(su0,0) AS HUGEINT)")} AS simhash FROM sg0),
       |ch AS (SELECT doc_id, su, simhash, unnest(range(0, 4)) AS chunk FROM sig),
       |ck AS (SELECT doc_id, chunk, simhash,
       |       CAST((su // (CASE chunk WHEN 0 THEN 1::HUGEINT WHEN 1 THEN 65536::HUGEINT
       |                    WHEN 2 THEN 4294967296::HUGEINT ELSE 281474976710656::HUGEINT END)) % 65536 AS BIGINT) AS ckey
       |       FROM ch),
       |okb AS (SELECT chunk, ckey FROM ck GROUP BY chunk, ckey HAVING count(*) <= $maxBucket),
       |pr AS (SELECT c.doc_id, c.chunk, c.ckey FROM ck c JOIN okb USING (chunk, ckey)),
       |cp AS (SELECT DISTINCT a.doc_id, b.doc_id AS nb_id FROM pr a JOIN pr b USING (chunk, ckey) WHERE a.doc_id <> b.doc_id)""".stripMargin
  }

  def simhashReport(maxBucket: Int = 50): String =
    s"""WITH $canonCte,
       |${simhashCandidateChain(maxBucket)},
       |hm AS (SELECT c.doc_id, c.nb_id, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
       |       FROM cp c JOIN sig sa ON sa.doc_id = c.doc_id JOIN sig sb ON sb.doc_id = c.nb_id),
       |best AS (SELECT doc_id, nb_id AS nn_id, hamming AS nn_hamming
       |         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hamming ASC, nb_id ASC) rn FROM hm) WHERE rn = 1)
       |SELECT s.doc_id, s.simhash, b.nn_id, b.nn_hamming FROM sig s LEFT JOIN best b USING (doc_id)""".stripMargin

  /** Recall oracle: the TRUE missed-pair count — exact pairs (computed
    * by the caller-supplied CTEs, exposed as `expair(a, b)` with a < b)
    * not present among the replayed capped bucket candidates. Measured,
    * not asserted: chunk/band collision is probabilistic (a Jaccard-0.8
    * pair can sit at simhash Hamming 9 and share no 16-bit chunk — seen
    * at sf0.1), so the oracle computes the same count the engine does
    * at ANY scale instead of hardcoding zero.
    */
  private def recallSql(candidateChain: String, exactCtes: String,
      exactPairsSelect: String): String =
    s"""WITH $canonCte,
       |$candidateChain,
       |ccanon AS (SELECT DISTINCT least(doc_id, nb_id) AS a,
       |                  greatest(doc_id, nb_id) AS b FROM cp),
       |$exactCtes,
       |expair AS ($exactPairsSelect)
       |SELECT CAST((SELECT count(*) FROM expair) AS BIGINT) AS n_exact_pairs,
       |  CAST((SELECT count(*) FROM expair e LEFT JOIN ccanon c
       |          ON c.a = e.a AND c.b = e.b
       |        WHERE c.a IS NULL) AS BIGINT) AS n_violations""".stripMargin

  def minhashRecall(exactCtes: String, exactPairsSelect: String,
      maxBucket: Int = 50): String =
    recallSql(minhashCandidateChain(maxBucket), exactCtes, exactPairsSelect)

  def simhashRecall(exactCtes: String, exactPairsSelect: String,
      maxBucket: Int = 50): String =
    recallSql(simhashCandidateChain(maxBucket), exactCtes, exactPairsSelect)

  /** The KMV estimator tree over an aggregate row carrying `m` and the
    * unsigned k-th hash `uk` — ONE definition mirrored verbatim from
    * `Kmv.estimator` so the three sketch oracles can never drift from
    * the engine (or each other).
    */
  private def kmvUD: String = {
    val ukS = toS("uk")
    s"(CASE WHEN $ukS < 0 THEN CAST($ukS AS DOUBLE) + " +
      s"18446744073709551616.0 ELSE CAST($ukS AS DOUBLE) END)"
  }

  private def kmvEst(k: Int): String =
    s"(CASE WHEN m < $k THEN CAST(m AS DOUBLE) " +
      s"ELSE ($k - 1.0) * 18446744073709551616.0 / $kmvUD END)"

  /** Oracle for [[graft.operators.Kmv.distinctEstimate]]: Spark's
    * `xxhash64` (hashLong, seed 42) over the distinct keys, the k
    * smallest UNSIGNED hash values, and the (k−1)·2⁶⁴/u_k estimator with
    * the exact-count fallback when fewer than k keys exist — the whole
    * sketch replayed value-exactly (hash, unsigned order, and the
    * double-conversion tree all mirror the Spark side literally).
    * DISTINCT applies at the HASH level (not just the key level),
    * matching Spark's `distinct` on the hashed column — a 64-bit
    * collision between two keys must waste a k-min slot on neither
    * engine or on both.
    */
  def kmvDistinct(k: Int, table: String = "events",
      keyCol: String = "user_id"): String = {
    val (ctes, last) = chain("kb", hashLongSteps("hin", "42::HUGEINT", "h"), "kc")
    s"""WITH u AS (SELECT DISTINCT $keyCol AS key FROM $table),
       |kb AS (SELECT ${toU("key")} AS hin FROM u),
       |${ctes.mkString(",\n")},
       |ks AS (SELECT DISTINCT hx FROM $last ORDER BY hx ASC LIMIT $k),
       |ka AS (SELECT count(*) AS m, max(hx) AS uk FROM ks)
       |SELECT CAST($k AS BIGINT) AS k, CAST(m AS BIGINT) AS n_kept,
       |  ${toS("uk")} AS kth_hash,
       |  ${kmvEst(k)} AS estimate
       |FROM ka""".stripMargin
  }

  /** Oracle for [[graft.operators.Hll.registers]]: Spark's xxhash64
    * (hashLong, seed 42) replayed in HUGEINT, register = top p bits,
    * rank = clz of the low 64−p bits + 1 computed via length(bin(w))
    * (bin() drops leading zeros, so clz = 64 − bitlen; bin(0) = '0'
    * needs the explicit w = 0 branch), max per register.
    */
  def hllRegisters(p: Int, table: String = "events",
      keyCol: String = "user_id"): String = {
    val shift = 64 - p
    val mask = (BigInt(1) << shift) - 1
    val (ctes, last) = chain("hb", hashLongSteps("hin", "42::HUGEINT", "h"), "hc")
    s"""WITH hb AS (SELECT ${toU(keyCol)} AS hin FROM $table),
       |${ctes.mkString(",\n")},
       |hr AS (
       |  SELECT CAST(hx >> $shift AS INT) AS register,
       |    CAST((CASE WHEN (hx & $mask::HUGEINT) = 0::HUGEINT THEN 64
       |               ELSE 64 - length(bin(hx & $mask::HUGEINT)) END)
       |         - $p + 1 AS INT) AS rho
       |  FROM $last)
       |SELECT register, max(rho) AS rho FROM hr GROUP BY register""".stripMargin
  }

  /** Oracle for [[graft.operators.Hll.registersPerGroup]]: the register
    * replay with the group key carried through the hash chain.
    */
  def hllRegistersPerGroup(p: Int, table: String = "events",
      keyCol: String = "user_id", grpCol: String = "event_type"): String = {
    val shift = 64 - p
    val mask = (BigInt(1) << shift) - 1
    val (ctes, last) = chain("gb", hashLongSteps("hin", "42::HUGEINT", "h"), "gc")
    s"""WITH gb AS (SELECT $grpCol AS grp, ${toU(keyCol)} AS hin FROM $table),
       |${ctes.mkString(",\n")},
       |gr AS (
       |  SELECT grp, CAST(hx >> $shift AS INT) AS register,
       |    CAST((CASE WHEN (hx & $mask::HUGEINT) = 0::HUGEINT THEN 64
       |               ELSE 64 - length(bin(hx & $mask::HUGEINT)) END)
       |         - $p + 1 AS INT) AS rho
       |  FROM $last)
       |SELECT grp, register, max(rho) AS rho
       |FROM gr GROUP BY grp, register""".stripMargin
  }

  /** Oracle for [[graft.operators.Kmv.distinctEstimatePerGroup]]: the
    * kmvDistinct replay with the k-min and estimator per group (a
    * row_number QUALIFY stands in for the WindowGroupLimit). `keySql`
    * is a subquery producing (grp, key) with key BIGINT.
    */
  def kmvDistinctPerGroup(k: Int, keySql: String,
      groupOut: String = "grp"): String = {
    val (ctes, last) = chain("kb", hashLongSteps("hin", "42::HUGEINT", "h"), "kc")
    s"""WITH u AS (SELECT DISTINCT grp, key FROM ($keySql)),
       |kb AS (SELECT grp, ${toU("key")} AS hin FROM u),
       |${ctes.mkString(",\n")},
       |kd AS (SELECT DISTINCT grp, hx FROM $last),
       |ks AS (SELECT grp, hx FROM (
       |    SELECT grp, hx, row_number() OVER (PARTITION BY grp
       |      ORDER BY hx ASC) AS rn FROM kd) WHERE rn <= $k),
       |ka AS (SELECT grp, count(*) AS m, max(hx) AS uk FROM ks GROUP BY 1)
       |SELECT grp AS $groupOut, CAST($k AS BIGINT) AS k,
       |  CAST(m AS BIGINT) AS n_kept,
       |  ${kmvEst(k)} AS estimate
       |FROM ka""".stripMargin
  }

  /** Oracle for [[graft.operators.Kmv.setAlgebra]]: both populations'
    * k-min sketches replayed through the hashLong chain, the union
    * sketch L as the k smallest of their union, membership flags by
    * hash equality, and the union/Jaccard/intersection estimator trees
    * mirrored literally. `aKeySql` / `bKeySql` are subqueries producing
    * a BIGINT `key` column.
    */
  def kmvSetAlgebra(k: Int, aKeySql: String, bKeySql: String): String = {
    val (ca, la) = chain("ha", hashLongSteps("hin", "42::HUGEINT", "h"), "hac")
    val (cb, lb) = chain("hb", hashLongSteps("hin", "42::HUGEINT", "h"), "hbc")
    val est = kmvEst(k)
    val rho = "(CAST(n_both AS DOUBLE) / CAST(m AS DOUBLE))"
    s"""WITH ua AS (SELECT DISTINCT key FROM ($aKeySql)),
       |ub AS (SELECT DISTINCT key FROM ($bKeySql)),
       |ha AS (SELECT ${toU("key")} AS hin FROM ua),
       |${ca.mkString(",\n")},
       |sa AS (SELECT DISTINCT hx FROM $la ORDER BY hx ASC LIMIT $k),
       |hb AS (SELECT ${toU("key")} AS hin FROM ub),
       |${cb.mkString(",\n")},
       |sb AS (SELECT DISTINCT hx FROM $lb ORDER BY hx ASC LIMIT $k),
       |l AS (SELECT DISTINCT hx FROM (SELECT hx FROM sa UNION ALL
       |        SELECT hx FROM sb) ORDER BY hx ASC LIMIT $k),
       |fl AS (SELECT l.hx,
       |    CASE WHEN a2.hx IS NOT NULL THEN 1 ELSE 0 END AS ina,
       |    CASE WHEN b2.hx IS NOT NULL THEN 1 ELSE 0 END AS inb
       |  FROM l LEFT JOIN sa a2 ON a2.hx = l.hx
       |         LEFT JOIN sb b2 ON b2.hx = l.hx),
       |ag AS (SELECT count(*) AS m, max(hx) AS uk,
       |    sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS n_both
       |  FROM fl)
       |SELECT CAST($k AS BIGINT) AS k, CAST(m AS BIGINT) AS n_union_kept,
       |  CAST(n_both AS BIGINT) AS n_both,
       |  $est AS union_est,
       |  $rho AS jaccard_est,
       |  $rho * $est AS intersect_est
       |FROM ag""".stripMargin
  }

  /** Oracle for [[graft.operators.CountMin.heavyHitters]]: the d
    * sketch hashes are Spark's multi-arg xxhash64 fold — hashInt(row
    * index, seed 42) feeding hashLong(key, that) as seed — replayed
    * through the same step chains as the minhash band keys; cells,
    * probes, and the min-estimate then follow relationally. Hashes are
    * computed once per DISTINCT key (hash(i, key) is functional) and
    * joined back for the multiset cell counts.
    */
  def cmsHeavyHitters(d: Int = 4, w: Int = 1024, topK: Int = 10,
      table: String = "events", keyCol: String = "user_id"): String = {
    val (seedCtes, seedLast) = chain("ki",
      hashIntSteps("i", s"${Seed}::HUGEINT", "S"), "cs")
    val (keyCtes, keyLast) = chain("ku",
      hashLongSteps("uk", "Sx", "H"), "ch")
    val cell = s"(((${toS("Hx")} % $w) + $w) % $w)"
    s"""WITH ks AS (SELECT DISTINCT $keyCol AS key FROM $table),
       |ki AS (SELECT key, i FROM ks CROSS JOIN range(0, $d) t(i)),
       |${seedCtes.mkString(",\n")},
       |ku AS (SELECT key, i, Sx, ${toU("key")} AS uk FROM $seedLast),
       |${keyCtes.mkString(",\n")},
       |hcell AS (SELECT key, i, $cell AS c FROM $keyLast),
       |cells AS (SELECT h.i AS r, h.c AS c, count(*) AS cnt
       |          FROM $table e JOIN hcell h ON e.$keyCol = h.key
       |          GROUP BY 1, 2),
       |top AS (SELECT $keyCol AS key, count(*) AS exact_count
       |        FROM $table GROUP BY 1
       |        ORDER BY exact_count DESC, key ASC LIMIT $topK)
       |SELECT t.key AS $keyCol, t.exact_count,
       |  min(c2.cnt) AS cms_estimate
       |FROM top t
       |JOIN hcell h ON h.key = t.key
       |JOIN cells c2 ON c2.r = h.i AND c2.c = h.c
       |GROUP BY 1, 2""".stripMargin
  }
}
