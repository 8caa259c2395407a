package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data pipelines (north-star ops on
  * the `documents` table). Everything is built from codegen'd Catalyst
  * built-ins with cross-engine-deterministic semantics: token hashes come
  * from md5 hex (identical in any engine), counts from split/replace
  * (identical semantics in Spark and DuckDB), so every operator has an
  * exact SQL oracle.
  */
object TextFunctions {

  /** Whitespace tokens (single-space split; empties preserved — matches
    * DuckDB string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles, e.g. n=3 word trigrams (native
    * expression — see [[WordShingles]] for the semantics contract). */
  def wordShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.GraftSqlBridge
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))
  }

  /** Deterministic 32-bit token hash: first 8 hex chars of md5, as a long.
    * Reproducible in any engine with md5 + hex parse. */
  def tokenHash32(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** 28-bit variant (7 hex chars) — small enough that a 31x polynomial
    * rolling fold stays far from Long overflow in any engine. */
  def tokenHash28(t: Column): Column =
    conv(substring(md5(t), 1, 7), 16, 10).cast("long")

  /** Canonical dedup normalization (the CCNet/Gopher-style pre-hash
    * cleanup): lowercase, collapse every non-alphanumeric run to one
    * space, trim. Deliberately ASCII-class only — `[^a-z0-9]+` has
    * identical semantics in Spark's and DuckDB's regex engines, so the
    * normalized form (and therefore its digest) is cross-engine exact.
    * Map-only: normalization never shuffles; the dedup that consumes it
    * inherits d1's one-hash-groupBy shape. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Occurrences of `marker` in text (padded word match), via the
    * length/replace trick — identical semantics in Spark and DuckDB. */
  def markerCount(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val m = s" $marker "
    ((length(padded) - length(replace(padded, lit(m), lit(""))))
      / lit(m.length)).cast("int")
  }

  /** Polynomial rolling-hash document fingerprint over token hashes:
    * fold h = (h*31 + tokenHash28) mod 2147483647, seed 7. Sequential and
    * exactly reproducible (no Long overflow by construction). */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), tokenHash28(_)),
      lit(7L),
      (acc, x) => pmod(acc * lit(31L) + x, lit(2147483647L)))

  /** PII patterns shared by the scrubber and its oracle. Deliberately
    * written in the regex intersection both Spark (java.util.regex) and
    * DuckDB (RE2) execute identically: explicit classes ([0-9], not \d),
    * no backrefs, no lookaround. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"

  /** PII scrubbing (emails then phone numbers → typed placeholder
    * tags) — the redaction pass every compliant training-data pipeline
    * runs before anything else sees the text. Pure map-side
    * regexp_replace chain, zero shuffle; DuckDB replays it with the same
    * patterns and the 'g' flag. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** Count of `re` matches (Spark's codegen'd regexp_count; DuckDB:
    * len(regexp_extract_all(...))). */
  def matchCount(text: Column, re: String): Column =
    regexp_count(text, lit(re)).cast("long")

  /** Sliding-window token chunking: (chunk_idx, tokens) windows of
    * `size` tokens every `stride` tokens — the context-window packing
    * step for training corpora. Windows start at 1, 1+stride, ...; the
    * last window may be short but never empty; a document shorter than
    * one window yields exactly one chunk. Built from sequence + slice
    * (codegen'd), so chunking is one map-side explode — zero shuffle —
    * and DuckDB replays it with generate_series + list slicing. */
  def tokenChunks(text: Column, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1, s"size/stride must be >= 1, got $size/$stride")
    val ts = tokens(text)
    val n = greatest(org.apache.spark.sql.functions.size(ts), lit(1))
    // starts: 1, 1+stride, ..., last start <= n (so every token is covered
    // once size >= stride; the final short window is kept)
    val starts = sequence(lit(1), n, lit(stride))
    transform(starts, st => struct(
      st.as("start"),
      slice(ts, st, lit(size)).as("toks")))
  }

  /** SimHash-32: per-bit vote over token hashes; bit b of the result is 1
    * when more tokens have bit b set than clear. Computed per-document from
    * the token-hash array (no shuffle). */
  def simHash32(text: Column): Column = {
    val hs = transform(tokens(text), tokenHash32(_))
    val terms = (0 until 32).map { b =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }
}
