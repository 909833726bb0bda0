package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token counting,
  * document statistics, heuristic language ID, and quality scoring. All
  * fully columnar (codegen'd `functions._` only — no UDFs), so they run at
  * scan speed and stay inside whole-stage codegen at 100 TB.
  *
  * Every formula is deterministic and replicated 1:1 in the DuckDB oracle
  * (SparkEntry.oracleSql), which is the correctness contract — note the
  * driver's synthetic corpus draws the same vocabulary for every `lang`
  * value, so language ID is graded formula-vs-formula, not vs the column.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex token count: letter runs, digit runs, and single
    * non-alphanumeric marks — the standard pre-tokenizer shape. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Rolling-hash document fingerprints with winnowing (MOSS — Schleimer,
    * Wilkerson, Aiken, SIGMOD 2003): Rabin–Karp polynomial hashes over
    * character k-grams (base 257, mod 1e9+7, mod applied per step so the
    * accumulator never overflows a long), then the minimum hash of every
    * window of w consecutive k-gram hashes, deduplicated per document —
    * the compact position-robust fingerprint set used for near-duplicate /
    * clone detection over large corpora. Extension beyond the reference
    * (SURVEY §2 LLM-pipeline family; the reference's only fingerprint is
    * the exact-dedup digest, [[Dedup.fingerprinted]]).
    *
    * The per-row kernel is a native expression
    * ([[graft.functions.WinnowFingerprints]] — the nested
    * higher-order-function formulation re-evaluates subtrees per element
    * and measured minutes over 500 short docs), replicated 1:1 in the
    * DuckDB oracle (q_doc_fingerprint: DuckDB's `list_reduce` folds from
    * the first element, which equals the 0-seeded fold since
    * 0·b + c₀ = c₀). Documents shorter than k + w − 1 codepoints have no
    * full window and are omitted.
    *
    * @return (doc_id, fp) — one row per distinct selected fingerprint
    */
  def winnowFingerprints(
      docs: DataFrame,
      k: Int = 8,
      w: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(graft.functions.TextFunctions.winnowFingerprints(
          col(textCol), k, w)).as("fp"))

  /** Per-document statistics: whitespace token count, distinct-token count,
    * average token length, regex token count. */
  def stats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      (aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
        .as("avg_token_len"),
      regexTokenCount(col(textCol)).as("n_regex_tokens"))
  }

  /** Function-word lexicons for the language-ID heuristic (n-gram/stopword
    * family; a tiny seeded lexicon rather than a trained model). */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "en" -> Seq("the", "a", "an", "and", "is", "not", "with", "to", "of", "in"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "no", "con", "una", "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "avec", "une", "pour", "du"),
    "zh" -> Seq("的", "了", "是", "在", "和", "不", "我", "有", "这", "个"))

  private def hits(toks: Column, lex: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(lex)))

  /** Heuristic language ID: per-language function-word hit counts, argmax
    * with ties → alphabetically-first language, zero hits → "und". */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val withHits = docs.select(
      Seq(col(idCol).cast("long").as("doc_id")) ++
        lexicons.map { case (l, lex) => hits(t, lex).as(s"${l}_hits") }: _*)
    val g = greatest(lexicons.map { case (l, _) => col(s"${l}_hits") }: _*)
    val pred = lexicons.init.foldLeft(when(g === 0, "und")) {
      case (acc, (l, _)) => acc.when(col(s"${l}_hits") === g, l)
    }.otherwise(lexicons.last._1)
    withHits.withColumn("predicted_lang", pred).withColumn("top_hits", g)
  }

  /** Gopher/MassiveText repetition quality signals (Rae et al. 2021,
    * §A1.1) — the filters that catch boilerplate and degenerate generation
    * loops heuristic length/diversity scores miss:
    *
    *   - `dup_token_frac`: 1 − distinct/total tokens (word-level repetition)
    *   - `top2gram_frac`: occurrences of the most frequent word 2-gram ÷
    *     total 2-gram windows
    *   - `dup3gram_frac`: 3-gram windows whose gram occurs ≥2 times ÷
    *     total 3-gram windows
    *
    * The n-gram signals are one pass per row in the native
    * [[graft.functions.RepetitionStats]] expression (zero shuffle — the
    * explode+groupBy formulation shuffles every n-gram occurrence of the
    * corpus); `dup_token_frac` stays declarative. Replicated 1:1 in the
    * DuckDB oracle via literal-string n-gram counts. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      (lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
        .as("dup_token_frac"),
      graft.functions.TextFunctions.repetitionStats(col(textCol)).as("rep"))
      .select(col("doc_id"), col("dup_token_frac"),
        col("rep").getItem(0).as("top2gram_frac"),
        col("rep").getItem(1).as("dup3gram_frac"))
  }

  /** Quality score ∈ [0,1]: 0.4·length + 0.3·lexical-diversity +
    * 0.3·stopword-plausibility (standard heuristic-filter shape — docs that
    * are too short, too repetitive, or stopword-free score low). */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val enLex = lexicons.toMap.apply("en")
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(t).as("n_tokens"),
      (size(array_distinct(t)).cast("double") / size(t)).as("distinct_ratio"),
      (hits(t, enLex).cast("double") / size(t)).as("stopword_ratio"))
      .withColumn("length_score", least(lit(1.0), col("n_tokens") / 100.0))
      .withColumn("quality",
        lit(0.4) * col("length_score") + lit(0.3) * col("distinct_ratio") +
          lit(0.3) * least(col("stopword_ratio") * 5.0, lit(1.0)))
  }
}
