package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, language-ID, quality scoring, fingerprinting).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs), so the expressions stay inside whole-stage codegen and are
  * reproducible in any ANSI engine — each primitive has a documented DuckDB
  * equivalent used by the oracle queries.
  */
object TextFunctions {

  /** Whitespace tokenization. DuckDB: `string_split_regex(trim(c), '\s+')`. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Deterministic normalization for dedup keys: NFC-agnostic lowercase +
    * whitespace collapse. DuckDB: `lower(regexp_replace(trim(c), '\s+', ' ', 'g'))`. */
  def normalized(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Word k-shingles as strings ("w1 w2 ... wk"); empty array when the
    * document is shorter than k. DuckDB equivalent (list comprehension):
    * `[array_to_string(w[i:i+k-1],' ') for i in range(1, len(w)-k+2)]`.
    *
    * Backed by the fused native [[graft.plans.WordShingles]] expression —
    * the composed `transform(sequence, i -> concat_ws(slice))` form runs
    * its lambda interpreted (~20× slower), and shingling feeds every hot
    * text path; WordShinglesSpec pins value equality with the composed
    * form. */
  def wordShingles(words: Column, k: Int): Column =
    graft.plans.WordShingles.wordShingles(words, k)

  /** The pre-native composed form of [[wordShingles]], kept as the
    * equality oracle for WordShinglesSpec. */
  private[graft] def wordShinglesComposed(words: Column, k: Int): Column =
    when(size(words) >= k,
      transform(sequence(lit(1), size(words) - (k - 1)),
        i => concat_ws(" ", slice(words, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** One MinHash component: the minimum (lexicographic) md5 of seed-salted
    * shingles. Lexicographic min over a uniform hex hash is a valid
    * min-hash; md5 hex output is identical across engines, so the whole
    * signature is oracle-checkable. Aggregate with `min` after exploding,
    * or array-reduce with [[arrayMinhash]]. */
  def saltedHash(seed: Int, shingle: Column): Column =
    md5(concat(lit(s"$seed|"), shingle))

  /** MinHash of a whole shingle array without exploding (per-row form).
    * DuckDB: `list_aggregate(list_transform(shingles, s -> md5(seed||'|'||s)), 'min')`. */
  def arrayMinhash(seed: Int, shingles: Column): Column =
    array_min(transform(shingles, s => saltedHash(seed, s)))

  /** Content fingerprint: md5 over the sorted distinct token set — the
    * "same bag of words" dedup key. DuckDB:
    * `md5(array_to_string(list_sort(list_distinct(w)), ' '))`. */
  def fingerprint(words: Column): Column =
    md5(array_join(array_sort(array_distinct(words)), " "))

  /** Stopword tables for the n-gram/stopword language-ID heuristic.
    * Public knowledge (most-frequent function words per language). */
  val StopwordTable: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Distinct-hit count of `words` against one language's stopword list.
    * DuckDB: `len(list_intersect(w, [...]))` (both engines dedup). */
  def stopwordHits(words: Column, lang: String): Column =
    size(array_intersect(words, array(StopwordTable(lang).map(lit): _*)))

  /** Language-ID by stopword-hit argmax, ties broken by language code
    * order; zero hits everywhere → 'und' (undetermined). */
  def langId(words: Column): Column = {
    val langs = StopwordTable.keys.toSeq.sorted
    val best = greatest(langs.map(l => stopwordHits(words, l)): _*)
    langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(best > 0 && stopwordHits(words, l) === best, l).otherwise(rest)
    }
  }
}
