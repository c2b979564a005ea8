package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for the LLM-data-pipeline operators.
  * Everything here is built from `org.apache.spark.sql.functions` so the
  * whole pipeline stays inside whole-stage codegen — no UDFs, no
  * serialization breaks, scan-to-aggregate fused at any scale.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (leading/trailing whitespace
    * would otherwise produce ghost tokens). */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** NULL text -> NULL count (size(null) is -1 under Spark's legacy
    * default, which would poison sums); matches DuckDB's null-propagating
    * len() in the oracles. */
  def tokenCount(c: Column): Column = when(c.isNull, lit(null)).otherwise(size(tokens(c)))

  /** BPE-ish sub-word token count: letter runs, single digits, punctuation —
    * the classic pre-tokenizer split (letters | digit | non-space symbol). */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))

  def bpeishTokenCount(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(size(bpeishTokens(c)))

  /** Canonical normalization for fingerprinting: lowercase, strip everything
    * but `[a-z0-9 ]`, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Document fingerprint = md5 of the normalized text (stable across
    * engines — used by the DuckDB oracle too). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Polynomial rolling hash over characters (h = (h*31 + code) mod 2^31),
    * a cheap order-sensitive fingerprint computed without leaving codegen.
    * The explicit modulus keeps every intermediate below 2^36 — under ANSI
    * mode an unbounded `h*31` would throw on long multiplication overflow
    * after ~13 characters. */
  def rollingHash(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (h, ch) => pmod(h * lit(31L) + ascii(ch), lit(2147483648L)))

  // -- PII redaction -----------------------------------------------------

  /** Email-address pattern (pragmatic, not RFC-exhaustive). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Long digit runs (phone/account/card-shaped, 6+ digits). */
  val LongNumberPattern = "[0-9]{6,}"

  /** Redact PII-shaped substrings: emails then long digit runs, replaced by
    * typed placeholder tokens. Two codegen'd regex passes, no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailPattern, "<EMAIL>"), LongNumberPattern, "<NUM>")

  /** How many PII-shaped substrings [[redactPii]] replaces — digit runs are
    * counted on the email-redacted text, matching the replacement order (a
    * digit run inside an email is consumed by the email pass). */
  def piiCount(c: Column): Column =
    (size(regexp_extract_all(c, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(c, EmailPattern, "<EMAIL>"), lit(LongNumberPattern), lit(0)))).cast("long")

  // -- per-document quality signals ------------------------------------

  def punctRatio(c: Column): Column = {
    val n = length(c)
    when(n === 0, 0.0d).otherwise(
      length(regexp_replace(c, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") / n.cast("double"))
  }

  def digitRatio(c: Column): Column = {
    val n = length(c)
    when(n === 0, 0.0d).otherwise(
      length(regexp_replace(c, "[^0-9]", "")).cast("double") / n.cast("double"))
  }

  def upperRatio(c: Column): Column = {
    val n = length(c)
    when(n === 0, 0.0d).otherwise(
      length(regexp_replace(c, "[^A-Z]", "")).cast("double") / n.cast("double"))
  }

  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0d).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t).cast("double"))
  }

  def stopwordRatio(c: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val t = tokens(lower(c))
    when(size(t) === 0, 0.0d).otherwise(
      size(filter(t, x => x.isin(stopwords: _*))).cast("double") / size(t).cast("double"))
  }

  /** Composite quality heuristic in [0,1]: long-enough, word-like,
    * not digit/punct-soup, has stopwords (≈ C4/Gopher-style filters).
    * Evaluated by the one-pass native expression — same arithmetic as
    * [[qualityScoreColumns]], ~10× cheaper per row. */
  def qualityScore(c: Column): Column =
    graft.plans.NativeExpressions.qualityScore(c, englishStopwords)

  /** The original built-ins-only formula (3 regex passes + 2 tokenizations
    * per evaluation). Kept as the executable spec the native expression is
    * tested against, and for callers who need a zero-custom-code plan. */
  def qualityScoreColumns(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0d), lit(1.0d))
    val wordScore = when(meanTokenLen(c).between(3.0, 12.0), 1.0d).otherwise(0.5d)
    val punctPenalty = lit(1.0d) - least(punctRatio(c) * 4.0d, lit(1.0d))
    val digitPenalty = lit(1.0d) - least(digitRatio(c) * 4.0d, lit(1.0d))
    val stopScore = least(stopwordRatio(c) * 3.0d, lit(1.0d))
    (lenScore + wordScore + punctPenalty + digitPenalty + stopScore) / lit(5.0d)
  }

  // -- language identification (n-gram/stopword heuristic) --------------

  val englishStopwords: Seq[String] = Seq(
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it", "was",
    "on", "are", "with", "as", "at", "be", "this", "have", "from")

  /** Per-language marker words for the heuristic language-ID. Marker sets
    * are intentionally disjoint-ish high-frequency function words. */
  val languageMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for", "was", "this"),
    "fr" -> Seq("le", "la", "les", "des", "une", "est", "dans", "pour", "que", "avec"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "es" -> Seq("el", "los", "las", "una", "por", "con", "para", "como", "más", "pero"),
    "it" -> Seq("il", "di", "che", "non", "per", "sono", "della", "anche", "come", "questo"))

  /** Stopword-hit count for one language over lowercase tokens. */
  def languageScore(c: Column, lang: String): Column =
    size(filter(tokens(lower(c)), t => t.isin(languageMarkers(lang): _*)))

  /** Language order — doubles as the tie-break priority (en first). */
  val languageOrder: Seq[String] = Seq("en", "fr", "de", "es", "it")

  /** Heuristic language-ID: argmax of marker-word hits; `und` when no
    * marker is seen. Ties break by language order (en first). Evaluated by
    * the one-pass native expression (five tokenize+filter stacks
    * otherwise); [[langIdColumns]] is the equivalent built-ins-only spec. */
  def langId(c: Column): Column =
    graft.plans.NativeExpressions.langId(c, languageOrder.map(l => l -> languageMarkers(l)))

  /** Built-ins-only language-ID formula (kept as the executable spec the
    * native expression is tested against). */
  def langIdColumns(c: Column): Column = {
    val scores = languageOrder.map(l => languageScore(c, l))
    val best = greatest(scores: _*)
    languageOrder.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }
}
