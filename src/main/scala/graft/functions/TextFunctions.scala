package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the large-scale pipeline
  * extensions (engine additions beyond the reference — SURVEY.md §7.1
  * item 8): tokenization, shingling, quality metrics, language-ID
  * heuristic, document fingerprinting.
  *
  * All pure column expressions (no UDFs) — whole-stage codegen'd and
  * exactly re-statable in ANSI SQL for the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace word tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, single symbols. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))

  /** Word n-gram shingles (space-joined). Empty when the doc has fewer
    * than `n` tokens — guarded explicitly: `sequence(1, 0)` would
    * produce the DESCENDING array [1, 0] and drive element_at out of
    * bounds. 1-based element_at matches DuckDB list indexing.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val tok = tokens(text)
    when(size(tok) >= n,
      transform(
        sequence(lit(1), size(tok) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tok, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set. */
  def shingleSet(text: Column, n: Int): Column = array_distinct(wordShingles(text, n))

  /** Largest multiplicity of any element of a string array (0 for an
    * empty array), computed IN-ROW: `array_sort` groups equal elements
    * adjacently, then one linear `aggregate` fold tracks the longest
    * run. No explode, no shuffle — the map-side core of the q208
    * repetition signals. The q67 gate computes the same value as
    * `max(count)` over an exploded (doc, token) group-by (two hash
    * exchanges of every corpus token); at 100 TB repetition scoring is
    * embarrassingly parallel per document, so the per-row form is the
    * production shape and q67's exchange form is the oracle anchor.
    */
  def maxMultiplicity(arr: Column): Column = {
    val sorted = array_sort(arr)
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1)).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
  }

  /** Word bigrams as space-joined strings, in-row (`zip_with` of the
    * array against its own tail — no explode).
    */
  def wordBigrams(toks: Column): Column =
    zip_with(slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Ratio of stopword tokens (deterministic stoplist). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def stopwordRatio(text: Column): Column = {
    val tok = tokens(text)
    size(filter(tok, t => t.isin(Stopwords: _*))).cast("double") / size(tok)
  }

  /** Ratio of non-[a-z0-9 space] characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") / length(text)

  /** Mean token length in characters (chars excluding single spaces). */
  def meanTokenLen(text: Column): Column = {
    val tok = tokens(text)
    (length(text) - (size(tok) - 1)).cast("double") / size(tok)
  }

  /** Quality flag: enough tokens, low punctuation, some stopwords —
    * the shape of a C4-style quality filter.
    */
  def isQuality(text: Column): Column =
    size(tokens(text)) >= 10 && stopwordRatio(text) <= lit(0.5) &&
      meanTokenLen(text) >= lit(2.0)

  /** Language-ID heuristic: stopword-marker scan (n-gram heuristics in
    * miniature). Deterministic CASE chain, re-statable in SQL.
    */
  def langIdHeuristic(text: Column): Column =
    when(text.rlike("(^| )(the|and) "), "en")
      .when(text.rlike("(^| )(le|la|et) "), "fr")
      .when(text.rlike("(^| )(el|los|y) "), "es")
      .when(text.rlike("(^| )(der|und) "), "de")
      .otherwise("unk")

  /** Polynomial rolling-hash fingerprint: fold (acc*31 + code) mod
    * 1e9+7 over the character stream — order-sensitive, so it
    * distinguishes permuted documents (unlike bag-of-words hashes).
    * Native single-pass expression; [[fingerprintDeclarative]] is the
    * semantically-identical lambda form (pinned equal in tests).
    */
  def fingerprint(text: Column): Column = Fingerprint64.fingerprint64(text)

  /** Declarative form of [[fingerprint]] (interpreted lambda per char
    * — reference semantics / oracle shape, ~10× slower).
    */
  def fingerprintDeclarative(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  // ---- PII redaction -------------------------------------------------

  /** Patterns restricted to constructs with identical semantics in
    * Java regex and RE2-family engines (char classes, `\b`, bounded
    * repetition) so the oracle SQL is the same pattern verbatim.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val DigitRunRe = "\\b\\d{7,}\\b"

  /** Training-data PII scrub: mask emails, IPv4 addresses, then long
    * digit runs (phone/account numbers). Order matters — emails may
    * embed digits and dots, IPs must be masked before the bare
    * digit-run pass. Pure map-side `regexp_replace` chain (global
    * replacement in both Spark and the oracle).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      DigitRunRe, "<NUM>")

  /** Did any PII pattern fire? (cheap pre-filter for audit counts). */
  def hasPii(text: Column): Column =
    text.rlike(EmailRe) || text.rlike(Ipv4Re) || text.rlike(DigitRunRe)
}
