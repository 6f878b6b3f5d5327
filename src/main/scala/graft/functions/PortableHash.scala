package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashes computable bit-identically in Spark and DuckDB, so that
  * hash-dependent operators (MinHash, SimHash, LSH) can be verified
  * against the SQL oracle. Built on MD5 (identical everywhere) rather
  * than engine-native hashes (Spark murmur3 vs DuckDB's own).
  *
  * At 100 TB scale MD5-per-shingle is ~2× slower than xxhash64 but
  * still cheap relative to the shuffle these operators feed; swapping
  * in `xxhash64` is a one-line change once oracle parity is no longer
  * needed.
  */
object PortableHash {

  /** Modulus for the universal hash family: smallest prime > 2^32. */
  val P: Long = 4294967311L

  /** Fixed (a, b) parameters; a < 2^30 keeps a*h < 2^62 (no int64
    * overflow in either engine). 16 functions: the first 8 drive the
    * 4-band LSH surface (`dd_minhash_lsh`); all 16 drive the 8-band
    * high-recall candidate generator behind `dd_ngram_jaccard`. */
  val minhashParams: Seq[(Long, Long)] = Seq(
    (536870909L, 98765431L), (387420489L, 12345677L),
    (268435399L, 424242421L), (134217689L, 777777773L),
    (93367803L, 31415927L), (71234567L, 27182818L),
    (533000389L, 161803399L), (222334565L, 141421357L),
    (402653171L, 271828183L), (301989917L, 314159257L),
    (201326557L, 577215661L), (100663291L, 662607015L),
    (50331653L, 137035999L), (25165843L, 299792459L),
    (12582917L, 602214077L), (6291469L, 160217663L))

  /** First 32 bits of md5 as a non-negative long in [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL mirror of [[h32]]. */
  def sqlH32(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8))::UBIGINT AS BIGINT)"

  /** Second 32 bits of md5 (hex chars 9-16) — an independent 32-bit
    * hash for 64-bit SimHash signatures; stays in [0, 2^32) so no
    * signed-overflow concerns in either engine. */
  def h32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** SQL mirror of [[h32b]]. */
  def sqlH32b(e: String): String =
    s"CAST(('0x' || substr(md5($e), 9, 8))::UBIGINT AS BIGINT)"

  /** i-th universal hash applied to an h32 value. */
  def uhash(h: Column, i: Int): Column = {
    val (a, b) = minhashParams(i)
    (h * a + b) % P
  }

  /** SQL mirror of [[uhash]]. */
  def sqlUhash(hExpr: String, i: Int): String = {
    val (a, b) = minhashParams(i)
    s"(($hExpr * $a + $b) % $P)"
  }
}
