package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs) so they survive 100 TB scans. */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-unit count: alpha runs + digit runs + single
    * punctuation marks (a cheap proxy for tokenizer load). */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of punctuation (non-alnum, non-space) characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))).cast("double") /
      length(text)

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column =
    (length(regexp_replace(trim(text), "\\s+", ""))).cast("double") / tokenCount(text)

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "y", "los", "de la", "es", "una", "que"))

  /** The exact regex used for hits — exposed so oracle SQL can embed
    * the identical pattern. */
  def stopwordPattern(lang: String): String =
    stopwords(lang).map(w => s"\\b$w\\b").mkString("|")

  def stopwordHits(text: Column, lang: String): Column =
    regexp_count(lower(text), lit(stopwordPattern(lang)))

  /** English-stopword density — the quality-score ingredient. */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") / greatest(tokenCount(text), lit(1))

  /** n-gram-heuristic language ID over {en,de,fr,es,zh}: CJK chars
    * dominate, else argmax of stopword hits (ties resolved in fixed
    * order en,de,fr,es). */
  def langId(text: Column): Column = {
    val zh = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    val en = stopwordHits(text, "en")
    val de = stopwordHits(text, "de")
    val fr = stopwordHits(text, "fr")
    val es = stopwordHits(text, "es")
    when(zh > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Composite quality score in [0,1]: token-length band + stopword
    * density − punctuation penalty (heuristic, monotone pieces). */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val lenScore = least(toks / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 2.0, lit(1.0))
    greatest(least((lenScore + stopScore) / 2.0 - punctPenalty * 0.25, lit(1.0)), lit(0.0))
  }

  /** Document fingerprint: md5 of casefolded, punctuation-stripped,
    * whitespace-collapsed text — robust to formatting-only edits. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))
      .cast("binary"))

  /** All text-quality columns at once over a documents frame. */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      tokenCount(t).as("n_tokens"),
      bpeishCount(t).as("n_subwords"),
      punctRatio(t).as("punct_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      meanWordLen(t).as("mean_word_len"),
      langId(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      fingerprint(t).as("fingerprint"))
  }
}
