package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (north-star extension):
  * token counting, quality scoring, language-ID heuristics, and document
  * fingerprinting — all pure Column expressions so they stay inside
  * whole-stage codegen and scan-pipeline at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens (empty strings from leading/trailing space removed). */
  def tokens(text: Column): Column =
    array_remove(split(text, "\\s+"), "")

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the standard pre-tokenizer regex family.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Crude chars-per-token estimate of token inflation (quality signal). */
  def avgWordLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(wordCount(text), lit(1L)).cast("double"))

  def punctRatio(text: Column): Column =
    ((length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double"))

  private val enStop = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")
  private val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "den", "mit")
  private val frStop = Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour")
  private val esStop = Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por")

  private def stopHits(text: Column, stop: Seq[String]): Column =
    size(array_intersect_counted(tokens(lower(text)), stop))

  // count tokens (with multiplicity) that are in the stopword list
  private def array_intersect_counted(toks: Column, stop: Seq[String]): Column =
    filter(toks, t => t.isin(stop.map(s => s: Any): _*))

  /** Fraction of tokens that are English stopwords — quality + lang signal. */
  def stopwordRatio(text: Column): Column =
    stopHits(text, enStop).cast("double") /
      greatest(wordCount(text), lit(1L)).cast("double")

  /** N-gram-free language-ID heuristic: argmax of per-language stopword hit
    * counts, 'unk' when nothing matches. Deterministic tie-break by the
    * listed language order (en > de > fr > es).
    */
  def langIdHeuristic(text: Column): Column = {
    val en = stopHits(text, enStop); val de = stopHits(text, deStop)
    val fr = stopHits(text, frStop); val es = stopHits(text, esStop)
    val m = greatest(en, de, fr, es)
    when(m === 0, "unk")
      .when(en === m, "en").when(de === m, "de")
      .when(fr === m, "fr").otherwise("es")
  }

  /** Composite quality score in [0,1]: length band + moderate punctuation +
    * stopword presence (the classic C4/Gopher-style cheap filters).
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(200, 10000), 0.4).otherwise(0.0)
    val punctOk = when(punctRatio(text) <= 0.1, 0.3).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.01, 0.3).otherwise(0.0)
    lenOk + punctOk + stopOk
  }

  /** Order-sensitive rolling document fingerprint over words:
    * h = (h*31 + ascii(first char)*256 + len(word)) mod 1e9+7.
    * A pure left fold — unlike the bag-of-words hashes, word order matters,
    * so reorderings fingerprint differently.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), w =>
        ascii(w).cast("long") * 256L + length(w).cast("long")),
      lit(0L), (h, v) => pmod(h * 31L + v, lit(1000000007L)))
}
