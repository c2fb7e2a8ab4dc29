package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing primitives shared by the dedup /
  * similarity / text-analysis operators.
  *
  * Everything here is engine-agnostic arithmetic (md5 + modular integer
  * ops) rather than Spark's xxhash64/murmur: the same value is computable
  * in any SQL engine (the DuckDB oracle reproduces it with
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), and it is stable across
  * Spark versions, partitionings and cluster topologies — the property a
  * 100 TB dedup pipeline needs so that re-runs and incremental batches
  * agree on identity.
  *
  * All expressions are built-in Catalyst functions (codegen'd, no UDFs).
  */
object Hashing {

  /** Mersenne prime 2^31-1: modulus for MinHash permutations and rolling
    * fingerprints. Products a*x with a,x < P stay under 2^62 (no Long
    * overflow). */
  val P: Long = 2147483647L

  /** 60-bit portable hash of a string: first 15 hex chars of md5.
    * Positive, fits a Long, identical in any engine with md5(). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** hash60 reduced into the MinHash ring [0, P). */
  def hashP(c: Column): Column = hash60(c) % P

  /** Driver/executor-side Scala twin of [[hash60]] — ONE definition of
    * the md5-prefix hash for code that runs outside Catalyst (the
    * streaming monitors' per-event state updates, the bootstrap mixer
    * derivation). Bit-identical to the Column face by construction. */
  def hash60Local(s: String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md5.take(15), 16)
  }

  /** Whitespace tokenization with empty-token removal — mirrors
    * `list_filter(string_split(text,' '), t -> t <> '')`. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Rolling polynomial fingerprint of a token sequence (document
    * fingerprinting): foldl (acc * B + hash(t) mod P) mod P. Order-
    * sensitive by design — permuted documents get different prints. */
  val B: Long = 1000003L
  def fingerprint(toks: Column): Column =
    aggregate(transform(toks, t => hashP(t)), lit(0L),
      (acc, h) => (acc * B + h) % P)
}
