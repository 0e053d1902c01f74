package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines (driver north
  * star, `BASELINE.json`). Everything here composes built-in
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd; no UDFs),
  * so the operators stay inside Tungsten at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization; empty tokens removed so leading/trailing
    * whitespace doesn't produce ghost tokens.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Lowercased alphanumeric-word tokens (BPE-ish regex splitting:
    * words, numbers, or single punctuation marks as tokens).
    */
  def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Character n-gram shingles of the lowercased, whitespace-collapsed
    * text. `transform(sequence(...))` keeps it inside codegen.
    */
  def charShingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val count = greatest(length(norm) - (n - 1), lit(0))
    when(count <= 0, array(norm)).otherwise(
      array_distinct(transform(sequence(lit(1), count), i => norm.substr(i, lit(n)))))
  }

  /** Word n-grams (token windows joined by a space). */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = wordTokens(text)
    val count = greatest(size(t) - (n - 1), lit(0))
    when(count <= 0, array(array_join(t, " "))).otherwise(
      array_distinct(transform(sequence(lit(0), count - 1),
        i => array_join(slice(t, i + 1, lit(n)), " "))))
  }

  /** Word n-grams WITH multiplicity (no distinct) — the counting form
    * used by repetition metrics; empty array when fewer than n tokens.
    */
  def wordNgramsAll(text: Column, n: Int): Column = {
    val t = wordTokens(text)
    val count = greatest(size(t) - (n - 1), lit(0))
    when(count <= 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), count - 1),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
  }

  /** Fraction of word n-grams that are repeats of an earlier occurrence
    * (1 - distinct/total) — the Gopher/C4-style repetition signal; high
    * values mark boilerplate and degenerate generations. 0.0 for
    * documents with fewer than n tokens.
    */
  def repeatedNgramFraction(text: Column, n: Int): Column = {
    val all = wordNgramsAll(text, n)
    when(size(all) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(all)).cast("double") / size(all).cast("double"))
  }

  /** PII redaction: emails, international-ish phone numbers, and IPv4
    * addresses replaced with typed placeholders. Patterns stay in the
    * RE2-compatible subset so any engine's regexp_replace agrees.
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9][0-9(). -]{6,14}[0-9]"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "[EMAIL]"),
        ipv4, "[IP]"),
      phone, "[PHONE]")
  }

  /** Jaccard similarity of two string-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  // ------------------------------------------------------------------
  // Quality scoring (length / punctuation / stopword / word-shape
  // ratios, the classic pre-training quality heuristics)
  // ------------------------------------------------------------------

  val EnglishStopwords: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "was",
    "for", "on", "are", "as", "with", "his", "they", "i", "at", "be",
    "this", "have", "from", "or", "had", "by", "not", "but", "what",
    "all", "were", "we", "when", "your", "can", "said", "there", "an",
    "which", "their", "if", "will", "each", "about", "how", "up", "out")

  /** Fixed punctuation set so Spark and any SQL oracle agree exactly. */
  private val PunctClass = "[.,!?;:]"

  def punctRatio(text: Column): Column = {
    val len = length(text).cast("double")
    val noPunct = length(regexp_replace(text, PunctClass, "")).cast("double")
    when(len === 0, lit(0.0)).otherwise((len - noPunct) / len)
  }

  def stopwordRatio(text: Column): Column = {
    val t = wordTokens(text)
    val stops = size(filter(t, w => w.isin(EnglishStopwords: _*))).cast("double")
    when(size(t) === 0, lit(0.0)).otherwise(stops / size(t).cast("double"))
  }

  def meanWordLength(text: Column): Column = {
    val t = wordTokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(t).cast("double"))
  }

  /** Composite 0–1 quality score: penalizes extreme punctuation, very
    * short documents, and stopword-free (non-linguistic) text.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 4)
  }

  // ------------------------------------------------------------------
  // Language identification (stopword-overlap heuristic)
  // ------------------------------------------------------------------

  /** Tiny per-language function-word inventories. Function words are
    * the highest-frequency tokens of each language, so overlap counting
    * is a serviceable n-gram-free language-ID heuristic at corpus scale.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas", "vous", "dans", "qui"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "por", "con", "para", "del"),
    "it" -> Seq("il", "di", "che", "non", "per", "una", "sono", "con", "del", "gli"))

  /** Predicted language code, or "und" when no marker matches.
    * Column form for composability — but Spark's higher-order functions
    * are CodegenFallback (interpreted), so this evaluates 5 interpreted
    * `filter(t, isin)` lambdas per row. For corpus-scale scoring use
    * [[langIdTable]], which keeps everything in whole-stage codegen.
    */
  def langId(text: Column): Column = langIdFromTokens(wordTokens(text))

  /** Language ID over an already-tokenized column (interpreted HOFs —
    * see [[langId]]; prefer [[langIdTable]] in hot paths).
    */
  def langIdFromTokens(t: Column): Column = {
    // build array<struct<score,lang>> and take the max (struct ordering
    // compares score first, then lang — deterministic ties)
    val scored = array(LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(t, w => w.isin(markers: _*))).as("score"), lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Corpus-scale language ID: every input column except `textCol`, plus
    * `predicted`, value-identical to [[langId]] but fully codegen'd —
    * explode tokens once, inner-join the broadcast (marker, lang)
    * inventory (≈50 rows), count matches per (doc, lang), argmax via
    * `max(struct(score, lang))` (score first, then lexicographically-
    * largest lang — the same deterministic tie-break as the
    * struct-ordering column form), and left-join back so marker-free
    * documents predict "und". One linear explode + two hash shuffles on
    * the doc id; no interpreted lambdas.
    */
  def langIdTable(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val langs = LangMarkers.keys.toSeq.sorted
    // base derived from the inventory size so adding a language widens
    // the encoding instead of failing; scores are bounded by document
    // token counts, far below Long.MaxValue / base
    val base = math.max(langs.size, 1).toLong
    val markers = langs.zipWithIndex
      .flatMap { case (lang, i) => LangMarkers(lang).map(w => (w, i)) }
      .toDF("_w", "_mi")
    val toks = df.select(col(idCol), explode(wordTokens(col(textCol))).as("_w"))
    // argmax over a single orderable LONG — score * base + lang index,
    // langs sorted ascending so a larger index is a lexicographically
    // larger code. Value-identical to max(struct(score, lang)) (score
    // first, lex-largest lang on ties) but the long max is
    // HASH-aggregable, where a struct-typed max buffer forces
    // SortAggregate: two extra sort passes over the per-doc frame at
    // every scale (plans/r19/q23_lang_id_{before,after}.txt).
    val langArr = array(langs.map(lit): _*)
    val best = toks.join(broadcast(markers), Seq("_w"))
      .groupBy(col(idCol), col("_mi"))
      .agg(count(lit(1)).as("_score"))
      .groupBy(col(idCol))
      .agg(max(col("_score") * base + col("_mi")).as("_enc"))
      .select(col(idCol),
        element_at(langArr, (col("_enc") % base).cast("int") + 1).as("_pred"))
    df.drop(textCol)
      .join(best, Seq(idCol), "left")
      .withColumn("predicted", coalesce(col("_pred"), lit("und")))
      .drop("_pred")
  }

  // ------------------------------------------------------------------
  // Fingerprinting
  // ------------------------------------------------------------------

  /** 64-bit fingerprint of the normalized text (whitespace-collapsed,
    * lowercased) — equal fingerprints ⇔ near-certainly equal normalized
    * content. xxhash64 is Spark-native and codegen'd.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** Polynomial rolling hash over word tokens (base-31 mod 2^61-1),
    * computed with `aggregate` — stays in codegen, order-sensitive
    * (unlike xxhash64-of-whole-string it can be computed incrementally
    * over token streams).
    */
  def rollingHash(text: Column): Column = {
    // modulus small enough that acc*31 + h cannot overflow Long under
    // ANSI arithmetic (Spark 4 default)
    val mod = lit(1000000007L)
    aggregate(wordTokens(text), lit(7L),
      (acc, w) => pmod(acc * 31 + pmod(xxhash64(w), mod), mod))
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by
    * token-hash bit, sign becomes the fingerprint bit. Near-duplicate
    * documents land within small Hamming distance.
    */
  def simhash(text: Column): Column = {
    val t = wordTokens(text)
    val counters = aggregate(
      t,
      array_repeat(lit(0), 64),
      (acc, w) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(w), b).bitwiseAND(1) === 1, 1)
            .otherwise(-1)),
        (a, x) => a + x))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
