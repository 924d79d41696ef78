package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis surface of the LLM-data-pipeline extension (SURVEY.md
  * §2.9 / builder north star): token counting, quality scoring, language
  * ID, document fingerprinting. Everything is a composable `Column`
  * function built from codegen'd Spark SQL primitives — no UDFs — so the
  * whole surface stays inside whole-stage codegen and is replicable in
  * the DuckDB oracle dialect.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text (empties preserved — callers
    * filter; matches DuckDB string_split semantics). */
  def tokens(text: Column): Column = split(lower(text), " ")

  def nonEmptyTokens(text: Column): Column =
    filter(tokens(text), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(nonEmptyTokens(text))

  /** BPE-ish segment count: alpha runs, digit runs, and single symbols. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def avgWordLen(text: Column): Column = {
    val ts = nonEmptyTokens(text)
    aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "los", "y", "un", "es", "que", "por", "una"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "pour", "vous", "une"))

  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val ts = nonEmptyTokens(text)
    size(filter(ts, t => t.isInCollection(words))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Stopword-vote language ID over {de,en,es,fr}: highest hit-ratio wins,
    * alphabetical-first on ties, "und"(etermined) when nothing matches —
    * the classic closed-vocabulary heuristic (real n-gram models need a
    * corpus; the decision structure is identical). */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
      (l, stopwordRatio(text, ws))
    }
    scored.foldLeft((lit("und"), lit(0.0))) { case ((bestL, bestS), (l, s)) =>
      (when(s > bestS, lit(l)).otherwise(bestL), when(s > bestS, s).otherwise(bestS))
    }._1
  }

  /** Composite quality score in [0,1]: favors alphabetic text with a sane
    * word-length profile and some function words; penalizes symbol soup.
    * (length/punct/stopword-ratio scoring per the north-star spec.) */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val alpha = alphaRatio(text)
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val stop = least(
      stopwords.values.map(ws => stopwordRatio(text, ws)).reduce(_ + _) * 5.0, lit(1.0))
    (lenScore + alpha + punctPenalty + stop) / 4.0
  }

  /** Order-sensitive positional fingerprint: sum(i * ascii(char_i)) mod p —
    * portable integer arithmetic (exactly replicable in any SQL engine). */
  def positionalFingerprint(text: Column, p: Long = 1000000007L): Column =
    aggregate(
      zip_with(sequence(lit(1), greatest(length(text), lit(1))),
        split(text, ""), (i, ch) => i.cast("long") * coalesce(ascii(ch).cast("long"), lit(0L))),
      lit(0L), (acc, x) => (acc + x) % p)

  /** Rolling polynomial hash h = h*31 + code (mod p) — the rolling-hash
    * fingerprint; JVM-side fold (library path; the positional fingerprint
    * above is the SQL-oracle-friendly twin). */
  def rollingFingerprint(text: Column, p: Long = 1000000007L): Column =
    aggregate(split(text, ""), lit(0L),
      (h, ch) => (h * 31 + coalesce(ascii(ch).cast("long"), lit(0L))) % p)
}
