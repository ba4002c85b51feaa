package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: language
 * ID, quality scoring, token counting, fingerprinting. All are composed from
 * codegen'd `org.apache.spark.sql.functions` (no UDFs) so they stay inside
 * WholeStageCodegen and scale linearly — each is a narrow map over the
 * `documents` table, no shuffle.
 */
object TextFunctions {

  /** Whitespace tokenization; empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Distinct-word set (order-normalized) — basis for Jaccard/fingerprints. */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word pieces + digits + punctuation counted
    * separately, ~the shape of a GPT-2-style pre-tokenizer regex. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Fixed-size overlapping token-window chunks — the context-window
    * splitting stage of a training-data pipeline. Returns
    * ARRAY<STRUCT<idx INT, chunk STRING, n_tokens INT>>; stride =
    * size - overlap, last window may be short, chunk count =
    * max(1, ceil((n - overlap) / stride)) for non-empty docs (0 for empty).
    * Pure codegen'd higher-order functions — explode downstream to get one
    * row per chunk. */
  def chunks(text: Column, size: Int, overlap: Int): Column =
    chunksOf(tokens(text), size, overlap)

  /** chunks() over a pre-materialized token ARRAY column — use this form
    * in hot paths (the per-chunk lambda slices `toks`; an inline tokenize
    * subtree would re-run once per chunk). */
  def chunksOf(toks: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"bad chunking config: size=$size overlap=$overlap")
    val step = size - overlap
    val n = org.apache.spark.sql.functions.size(toks)
    val nChunks =
      greatest(lit(1), floor((n - overlap + step - 1) / lit(step.toDouble)).cast("int"))
    // sequence(a, b) with b < a counts DOWN — guard the empty-doc case
    val windows = transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1), i => {
      val piece = slice(toks, i * step + 1, lit(size))
      struct(i.cast("int").as("idx"),
        array_join(piece, " ").as("chunk"),
        org.apache.spark.sql.functions.size(piece).cast("int").as("n_tokens"))
    })
    when(n > 0, windows)
      .otherwise(array().cast("array<struct<idx:int,chunk:string,n_tokens:int>>"))
  }

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Number of tokens that are English stopwords (Gopher's "must contain
    * ≥2 stopwords" rule counts hits, not the ratio). */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin(enStop.map(lit): _*))).cast("long")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val stops = filter(toks, t => t.isin(enStop.map(lit): _*))
    when(size(toks) === 0, 0.0).otherwise(size(stops).cast("double") / size(toks))
  }

  /** n-gram-free language-ID heuristic: stopword hit rate + ASCII ratio.
    * Returns "en" when English stopwords are frequent, "other" otherwise —
    * deterministic, SQL-expressible (oracle-checkable). */
  def langId(text: Column): Column =
    when(stopwordRatio(text) >= 0.08, "en").otherwise("other")

  /** Quality score in [0,1]: blend of length, alpha ratio, punctuation
    * balance and stopword signal (heuristics in the spirit of C4/Gopher
    * quality filters, computed columnar). */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 500.0, lit(1.0))
    val alpha = regexp_count(text, lit("[A-Za-z]")).cast("double") / greatest(len, lit(1.0))
    val punct = regexp_count(text, lit("[.,;:!?]")).cast("double") / greatest(len, lit(1.0))
    val punctScore = lit(1.0) - least(punct * 10.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore * 0.3 + alpha * 0.3 + punctScore * 0.2 + stopScore * 0.2), 4)
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * word set — cheap bag-of-words identity for near-dup blocking. */
  def wordSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(wordSet(text)), " "))

  /** Rolling polynomial hash over tokens (order-sensitive), mod 2^31-1 —
    * the classic Rabin-Karp document fingerprint, via the `aggregate`
    * higher-order function (stays codegen'd, no UDF). */
  def rollingHashFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(1000000007L)), lit(2147483647L)))

  /** Word n-gram shingles from a pre-materialized token ARRAY column.
    * Spark expressions are trees, not DAGs: a lambda that references a
    * big subtree re-evaluates it PER ELEMENT, so hot paths must pass a
    * real column here (materialized via withColumn), not `tokens(text)`
    * inline — with an attribute reference the per-element work is just
    * the slice. */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Word n-gram shingles (n consecutive tokens joined by space).
    * Convenience form; for per-row hot paths materialize the token array
    * first and use shinglesOf. */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  // ---- repetition signals (Gopher-style quality filters, Rae et al.
  // 2021 §A1.1: documents dominated by repeated lines / n-grams are
  // boilerplate or spam and get dropped before training) -----------------

  /** Fraction of lines that are duplicates of an earlier line
    * (0 = all lines distinct, →1 = one line repeated over and over).
    * Lines split on newline, trimmed, empties ignored. */
  def duplicateLineFraction(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    when(size(lines) === 0, lit(0.0)).otherwise(
      (size(lines) - size(array_distinct(lines))).cast("double") / size(lines))
  }

  /** Fraction of all tokens covered by occurrences of the single most
    * frequent word n-gram (Gopher's top-n-gram fraction): high values
    * mean one phrase dominates the document. The per-row count is a
    * longest-equal-run scan over the SORTED shingle array — O(S log S)
    * per document, not the O(S²) count-per-distinct-shingle form.
    * `sh`/`nToks` should be pre-materialized columns (see shinglesOf). */
  def topNgramFractionOf(sh: Column, nToks: Column, n: Int): Column = {
    val sorted = sort_array(sh)
    val top = aggregate(sorted,
      struct(lit(null).cast("string").as("p"), lit(0).as("r"), lit(0).as("b")),
      (acc, x) => {
        val run = when(x <=> acc.getField("p"), acc.getField("r") + 1).otherwise(lit(1))
        struct(x.as("p"), run.as("r"),
          greatest(acc.getField("b"), run).as("b"))
      },
      acc => acc.getField("b"))
    when(nToks === 0 || size(sh) === 0, lit(0.0))
      .otherwise((top * n).cast("double") / nToks)
  }

  def topNgramFraction(text: Column, n: Int): Column =
    topNgramFractionOf(shingles(text, n), tokenCount(text), n)

  /** Fraction of tokens inside word n-grams that occur more than once
    * (duplicate-n-gram coverage — the companion Gopher signal to the
    * top-n-gram fraction). Approximated as duplicated-shingle count × n
    * over the token count, capped at 1. */
  def duplicateNgramFractionOf(sh: Column, nToks: Column, n: Int): Column = {
    val dups = size(sh) - size(array_distinct(sh))
    when(nToks === 0, lit(0.0))
      .otherwise(least((dups * n).cast("double") / nToks, lit(1.0)))
  }

  def duplicateNgramFraction(text: Column, n: Int): Column =
    duplicateNgramFractionOf(shingles(text, n), tokenCount(text), n)

  /** Shannon entropy (bits/char) of the document's character distribution —
    * the classic randomness/spam signal (near 0 = one repeated char, ~4.x =
    * normal prose, high = encoded blobs/minified junk). Newlines are
    * excluded ('.' does not match them — same in RE2, so the oracle
    * replays exactly). Computed entirely map-side, no shuffle, no UDF:
    * H = log2(n) − (Σ k·log2 k)/n over the run lengths k of the SORTED
    * char array — one native sort plus ONE O(n) lambda pass per row.
    * (The naive count-per-distinct-char form is O(|distinct| × n) in
    * interpreted lambda steps and measured ~8× slower; see the simhash
    * note on HOF evaluation.) The sorted order also makes the fp
    * summation order deterministic per document. */
  def charEntropy(text: Column): Column = {
    val chars = sort_array(regexp_extract_all(text, lit("."), lit(0)))
    val n = size(chars).cast("double")
    def closeRun(r: Column, s: Column): Column =
      s + when(r > 0, r * log2(r)).otherwise(lit(0.0))
    // (p, r, s) = (previous char, current run length, Σ k·log2 k of runs
    // closed so far); the finisher closes the last run
    val sumKLogK = aggregate(chars,
      struct(lit(null).cast("string").as("p"), lit(0.0).as("r"),
        lit(0.0).as("s")),
      (acc, x) => {
        val same = x <=> acc.getField("p")
        struct(x.as("p"),
          when(same, acc.getField("r") + 1.0).otherwise(lit(1.0)).as("r"),
          when(same, acc.getField("s"))
            .otherwise(closeRun(acc.getField("r"), acc.getField("s"))).as("s"))
      },
      acc => closeRun(acc.getField("r"), acc.getField("s")))
    when(n === 0, lit(0.0)).otherwise(log2(n) - sumKLogK / n)
  }
}
