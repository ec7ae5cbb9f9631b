package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents table: tokenization,
  * language ID, quality scoring, fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split / higher-order lambdas / regexp) — no UDFs — so the whole text
  * pipeline stays inside WholeStageCodegen and is portable to a SQL oracle.
  */
object TextFns {

  /** Whitespace tokens (single-space split: the corpus is single-space
    * separated; keeps exact parity with `string_split` in SQL engines).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens equal to any of `words` — the building block for
    * stopword ratios and language scores.
    */
  def tokenCountIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Stopword marker lists per language (deterministic heuristic profile). */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "a"),
    "de" -> Seq("der", "die", "und", "ein"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** CJK codepoint presence — marks zh regardless of token scores. */
  def hasCjk(text: Column): Column = text.rlike("[\\x{4e00}-\\x{9fff}]")

  /** Deterministic argmax language prediction with fixed priority
    * en > de > es > fr on ties; "zh" if any CJK characters present.
    * (n-gram-heuristic language ID for the LLM-data pipeline.)
    */
  def predictLang(text: Column): Column = {
    val t = tokens(text)
    val s = Map(
      "en" -> tokenCountIn(t, markers("en")),
      "de" -> tokenCountIn(t, markers("de")),
      "es" -> tokenCountIn(t, markers("es")),
      "fr" -> tokenCountIn(t, markers("fr")))
    when(hasCjk(text), "zh")
      .when(s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("fr"), "en")
      .when(s("de") >= s("es") && s("de") >= s("fr"), "de")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** Normalized-text fingerprint: lowercase, collapse every non-[a-z0-9]
    * run to a single space, trim, md5 — a deterministic rolling-hash-style
    * document fingerprint (identical docs modulo punctuation/casing
    * collide).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")).cast("binary"))

  /** PII patterns, restricted to syntax valid in BOTH Java regex and RE2
    * (character classes, bounded repetition — no lookaround), so the same
    * pattern string runs in Spark and any RE2-based SQL engine.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "555-[0-9]+"

  /** Count of non-overlapping matches of `pattern` in `text`. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails and phone numbers with typed placeholder tags — the
    * standard pre-training PII scrub. Pure `regexp_replace` (codegen'd,
    * replaces ALL occurrences), no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
      lit(PhoneRe), lit("[PHONE]"))
}
