package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic text/hash primitives used by the dedup, similarity
  * and text-analysis packs.
  *
  * The hash is derived from md5 so the DuckDB oracle can compute the exact
  * same value in SQL (`('0x' || substr(md5(x),1,N))::BIGINT`); engine-native
  * hashes (xxhash64, DuckDB hash()) differ between engines and would make
  * results unverifiable. md5 here is a deterministic fingerprint, not a
  * security boundary. All built-ins → whole-stage codegen, no UDFs.
  */
object TextFns {

  /** 60-bit positive hash of a string: first 15 hex digits of md5.
    * DuckDB mirror: ('0x' || substr(md5(x),1,15))::BIGINT. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens (the corpus is single-space joined). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles, 1-based positions 1..n-2 — matches DuckDB
    * `list_transform(range(1, len-1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))`.
    * Empty when fewer than 3 tokens. */
  def shingles3(toks: Column): Column =
    when(
      size(toks) >= 3,
      transform(
        sequence(lit(1), size(toks) - 2),
        i =>
          concat_ws(
            " ",
            element_at(toks, i),
            element_at(toks, i + 1),
            element_at(toks, i + 2)
          )
      )
    ).otherwise(array().cast("array<string>"))

  /** Mersenne prime 2^31 - 1: keeps (2k+1)·h + 12289k < 2^62 (no overflow). */
  val MinhashP = 2147483647L

  /** Base hashes for MinHash: ONE md5 per shingle, reduced mod p, computed
    * by the codegen'd kernel (same values as
    * `transform(dsh, x -> h60(x) % p)` — see [[Kernels.md5Array60]]).
    * IMPORTANT: materialize this (exchange/cache) before fanning out into
    * the k signature lanes — higher-order-function lambdas are interpreted
    * (no codegen CSE), so a nested `transform(baseHashes(...), ...)` would
    * re-run every md5 once per lane (measured 60× slower). */
  def minhashBaseHashes(dshingles: Column): Column =
    Kernels.md5Array60(dshingles, MinhashP)

  /** MinHash signature from materialized base hashes: k cheap derived hash
    * functions h_s = ((2s+1)·h + 12289·s) mod p — the standard affine
    * family, identical integer arithmetic in the DuckDB mirror. */
  def minhashSigFromHashes(hs: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      s =>
        array_min(
          transform(hs, h => ((s * 2 + 1).cast("long") * h + s.cast("long") * 12289L) % MinhashP)
        )
    )

  /** One-shot MinHash signature (small inputs / tests; see the CSE caveat
    * on [[minhashBaseHashes]] before using in a hot path). */
  def minhashSig(dshingles: Column, k: Int): Column =
    minhashSigFromHashes(minhashBaseHashes(dshingles), k)
}
