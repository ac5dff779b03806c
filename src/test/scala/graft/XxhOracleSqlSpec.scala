package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.TextFunctions

/** Pins the ALGORITHM the DuckDB oracle (graft.oracle.XxhOracleSql)
  * encodes: the same mod-2^64 formulas it emits as HUGEINT SQL —
  * including the split-constant multiply for primes >= 2^63 — are
  * re-executed here over BigInt and must reproduce Spark's native
  * xxhash64 bit-for-bit (byte strings across every length regime, the
  * 8-byte/4-byte primitive paths, and the multi-argument fold), and the
  * oracle's string-level shingle/token derivation must agree with the
  * byte-level Catalyst expressions (MinHashSignature / SimHash64) on
  * real corpus text. The SQL↔engine equivalence itself is re-checked by
  * the driver's gate every round; this spec keeps the algorithm from
  * drifting in between.
  */
class XxhOracleSqlSpec extends SparkSuite {

  private val W = BigInt(1) << 64
  private val H63 = BigInt(1) << 63
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  // the exact arithmetic shapes the SQL emits
  private def mulc(a: BigInt, c: BigInt): BigInt =
    if (c < H63) (a * c) % W
    else ((a * (c - H63)) % W + (a % 2) * H63) % W
  private def rotl(x: BigInt, r: Int): BigInt =
    ((x % (BigInt(1) << (64 - r))) << r) + (x >> (64 - r))
  private def xor(a: BigInt, b: BigInt): BigInt = a ^ b
  private def fmix(h0: BigInt): BigInt = {
    var h = xor(h0, h0 >> 33)
    h = mulc(h, P2); h = xor(h, h >> 29)
    h = mulc(h, P3); xor(h, h >> 32)
  }
  private def hashLong(inp: BigInt, seed: BigInt): BigInt = {
    var h = (seed + P5 + 8) % W
    h = xor(h, mulc(rotl(mulc(inp, P2), 31), P1))
    fmix((mulc(rotl(h, 27), P1) + P4) % W)
  }
  private def hashInt(inp: Long, seed: BigInt): BigInt = {
    var h = (seed + P5 + 4) % W
    h = xor(h, (BigInt(inp & 0xFFFFFFFFL) * P1) % W)
    fmix((mulc(rotl(h, 23), P2) + P3) % W)
  }
  private def word(b: Array[Byte], o: Int, n: Int): BigInt =
    (0 until n).map(k => BigInt(b(o + k) & 0xFF) << (8 * k)).sum
  private def hashBytes(b: Array[Byte], seed: BigInt): BigInt = {
    val len = b.length
    var off = 0
    var h =
      if (len >= 32) {
        var v1 = (seed + P1 + P2) % W
        var v2 = (seed + P2) % W
        var v3 = seed % W
        var v4 = (seed - P1 + W) % W
        while (off <= len - 32) {
          v1 = mulc(rotl((v1 + mulc(word(b, off, 8), P2)) % W, 31), P1)
          v2 = mulc(rotl((v2 + mulc(word(b, off + 8, 8), P2)) % W, 31), P1)
          v3 = mulc(rotl((v3 + mulc(word(b, off + 16, 8), P2)) % W, 31), P1)
          v4 = mulc(rotl((v4 + mulc(word(b, off + 24, 8), P2)) % W, 31), P1)
          off += 32
        }
        var m = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) % W
        for (v <- Seq(v1, v2, v3, v4))
          m = (mulc(xor(m, mulc(rotl(mulc(v, P2), 31), P1)), P1) + P4) % W
        m
      } else (seed + P5) % W
    h = (h + len) % W
    while (off + 8 <= len) {
      h = xor(h, mulc(rotl(mulc(word(b, off, 8), P2), 31), P1))
      h = (mulc(rotl(h, 27), P1) + P4) % W
      off += 8
    }
    if (off + 4 <= len) {
      h = xor(h, (word(b, off, 4) * P1) % W)
      h = (mulc(rotl(h, 23), P2) + P3) % W
      off += 4
    }
    while (off < len) {
      h = xor(h, (BigInt(b(off) & 0xFF) * P5) % W)
      h = mulc(rotl(h, 11), P1)
      off += 1
    }
    fmix(h)
  }
  private def signed(u: BigInt): Long =
    (if (u >= H63) u - W else u).toLong

  test("mod-2^64 replay matches Spark's xxhash64: bytes, long, int, fold") {
    val strs = Seq("", "a", "abc", "hello world", "x" * 31, "y" * 32,
      "z" * 33, "q" * 63, "r" * 64, "w" * 100, "seven77", "eight888",
      "nine99999", "éclair naïve 日本語 test")
    val got = spark.sql(
      "SELECT " + strs.map(s => s"xxhash64('$s')").mkString(", ")).collect().head
    strs.zipWithIndex.foreach { case (s, i) =>
      assert(got.getLong(i) == signed(hashBytes(s.getBytes("UTF-8"), 42)),
        s"bytes mismatch on ${s.take(20)}")
    }
    val prim = spark.sql(
      """SELECT xxhash64(CAST(123456789 AS BIGINT)),
        |       xxhash64(CAST(-42 AS BIGINT)),
        |       xxhash64(CAST(5 AS INT)),
        |       xxhash64(CAST(7 AS INT), CAST(123 AS BIGINT))""".stripMargin)
      .collect().head
    assert(prim.getLong(0) == signed(hashLong(BigInt(123456789), BigInt(42))))
    assert(prim.getLong(1) == signed(hashLong(BigInt(-42) + W, BigInt(42))))
    assert(prim.getLong(2) == signed(hashInt(5, BigInt(42))))
    // Spark's multi-arg xxhash64 folds left with the running hash as seed
    assert(prim.getLong(3) == signed(hashLong(BigInt(123), hashInt(7, BigInt(42)))))
  }

  // the oracle's string-level shingle/token derivation, over UTF-8 bytes
  private def minhashReplay(nt: String, n: Int = 32): Seq[Long] = {
    val b = nt.getBytes("UTF-8")
    val toks = {
      // split on single spaces, preserving empties (canonical text)
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var start = 0
      for (i <- 0 to b.length) {
        if (i == b.length || b(i) == ' '.toByte) {
          out += b.slice(start, i); start = i + 1
        }
      }
      out.toSeq
    }
    val shingles =
      if (toks.length >= 3)
        (0 until toks.length - 2).map(s =>
          toks.slice(s, s + 3).reduce((a, c) => a ++ Array(' '.toByte) ++ c))
      else Seq(b)
    val mins = Array.fill(n)(Long.MaxValue)
    for (sg <- shingles) {
      val hseed = hashLong(hashBytes(sg, 42), BigInt(42))
      for (j <- 0 until n) {
        val h = signed(hashInt(j, hseed))
        if (h < mins(j)) mins(j) = h
      }
    }
    mins.toSeq
  }

  private def simhashReplay(nt: String): Long = {
    val b = nt.getBytes("UTF-8")
    val sums = new Array[Int](64)
    var start = 0
    for (i <- 0 to b.length) {
      if (i == b.length || b(i) == ' '.toByte) {
        val h = hashBytes(b.slice(start, i), 42)
        for (j <- 0 until 64)
          if (h.testBit(j)) sums(j) += 1 else sums(j) -= 1
        start = i + 1
      }
    }
    var sig = BigInt(0)
    for (j <- 0 until 64) if (sums(j) > 0) sig = sig.setBit(j)
    signed(sig)
  }

  test("oracle signature algorithm equals the Catalyst expressions on corpus text") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .where(col("text").isNotNull)
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"),
        graft.functions.MinHashSignature(
          TextFunctions.normText(col("text")), 32).as("mh"),
        graft.functions.SimHash64(TextFunctions.normText(col("text"))).as("sh"))
      .limit(50).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val nt = r.getString(1)
      assert(r.getSeq[Long](2) == minhashReplay(nt), s"minhash doc ${r.getLong(0)}")
      assert(r.getLong(3) == simhashReplay(nt), s"simhash doc ${r.getLong(0)}")
    }
  }
}
