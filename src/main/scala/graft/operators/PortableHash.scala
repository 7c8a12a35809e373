package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The engine's portable 60-bit hash gadget: first 15 hex digits of
  * md5 of a value's decimal string, as a non-negative BIGINT — the one
  * deterministic "randomness" primitive every sampled/sketched operator
  * builds on (d42 minhash keys, d43 simhash, q11c KMV input, q34/q35
  * centroid sampling, d46 stratified sampling), because both Spark and
  * DuckDB compute it bit-identically:
  *   Spark:  conv(substring(md5(cast(x AS STRING)), 1, 15), 16, 10)
  *   DuckDB: ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT
  */
object PortableHash {

  /** 2^60 — the h60 value space (exclusive upper bound). */
  val HashSpace: BigInt = BigInt(1) << 60

  /** The same bound as a DuckDB HUGEINT literal, for threshold
    * arithmetic that must not overflow BIGINT.
    */
  val HashSpaceSqlHugeInt: String = s"$HashSpace::HUGEINT"

  /** Same value as `conv(substring(md5(..), 1, 15), 16, 10)::long`, via
    * the native [[graft.functions.Md5Bits60]] fast path (≈5× cheaper per
    * call: no hex string, no base-conversion parse — measured r18, see
    * HashExpressions). HashFnsSpec pins bit-equality to the built-in
    * spelling; every hash-grade oracle query re-proves it downstream.
    */
  def h60(c: Column): Column =
    graft.functions.HashFns.md5Bits60(c.cast(StringType))

  def h60Sql(expr: String): String =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 15))::BIGINT"
}
