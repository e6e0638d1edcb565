package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions._

/** Text-analysis operator family: language-ID (stopword heuristic),
  * quality scoring, token counting (whitespace + BPE-ish regex), and
  * document fingerprinting. All pure column expressions — codegen'd,
  * shuffle-free per-document map work, so they scale linearly with corpus
  * size.
  */
object TextQueries {

  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Language-ID by stopword-hit argmax vs the labeled `lang` column.
    * The synthetic corpus is English-ish word soup, so the interesting
    * output is the deterministic prediction itself, not accuracy. */
  val langId = {
    val langs = StopwordTable.keys.toSeq.sorted // de, en, es, fr, zh
    def hits(l: String) =
      s"len(list_intersect($W, [${StopwordTable(l).map(w => s"'$w'").mkString(",")}]))"
    val best = langs.map(hits).mkString("greatest(", ", ", ")")
    val chain = langs.map(l => s"WHEN best > 0 AND ${hits(l)} = best THEN '$l'")
      .mkString(" ")
    Q(
      "q_text_langid",
      s"""SELECT lang_pred, count(*) AS n, count(DISTINCT lang) AS n_true_langs
         |FROM (
         |  SELECT CASE $chain ELSE 'und' END AS lang_pred, lang
         |  FROM (SELECT text, lang, $best AS best FROM documents)
         |) GROUP BY lang_pred ORDER BY lang_pred""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("lang_pred", graft.functions.TextFunctions.langId(tokens(col("text"))))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("n_true_langs"))
        .orderBy("lang_pred")
    }
  }

  /** Quality scoring: token count, distinct ratio, mean token length,
    * stopword ratio — the filter features of a pretraining cleanliness
    * pass. Ratios are IEEE-exact integer divisions, so they hash-match. */
  val quality = Q(
    "q_text_quality",
    s"""SELECT doc_id, n_words,
       |  n_distinct * 1.0 / n_words AS distinct_ratio,
       |  total_chars * 1.0 / n_words AS mean_word_len,
       |  sw_hits * 1.0 / n_words AS stopword_ratio
       |FROM (
       |  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
       |    list_sum(list_transform(w, x -> length(x))) AS total_chars,
       |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x))) AS sw_hits
       |  FROM (SELECT doc_id, $W AS w FROM documents)
       |) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val en = StopwordTable("en")
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        size(array_distinct(col("w"))).as("n_distinct"),
        aggregate(col("w"), lit(0), (acc, x) => acc + length(x)).as("total_chars"),
        size(filter(col("w"), x => array_contains(array(en.map(lit): _*), x))).as("sw_hits"))
      .select(
        col("doc_id"), col("n_words"),
        (col("n_distinct").cast("double") / col("n_words")).as("distinct_ratio"),
        (col("total_chars").cast("double") / col("n_words")).as("mean_word_len"),
        (col("sw_hits").cast("double") / col("n_words")).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Token counting two ways: whitespace words vs a BPE-ish regex lexer
    * (letter runs | digit runs | single punctuation), aggregated per
    * source — the per-shard token accounting of a corpus build. */
  val tokenCounts = Q(
    "q_text_tokens",
    s"""SELECT source,
       |  CAST(sum(len($W)) AS BIGINT) AS ws_tokens,
       |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens,
       |  count(*) AS n_docs
       |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("source")
      .agg(
        sum(size(tokens(col("text")))).as("ws_tokens"),
        sum(size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")))
          .as("bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("source")
  }

  /** TF-IDF keyword extraction: top-3 terms per document by tf·idf —
    * the salient-term tagging pass of a corpus index. Everything stays
    * in INTEGER space: for a fixed corpus, tf·N/df orders identically to
    * tf/df, so the rank key is the integer quotient `tf·10⁶ div df` —
    * no float accumulation, no cross-engine last-ulp drift, ties broken
    * by term. Plan shape: one hash-agg for tf (doc, term), then df as a
    * COUNT OVER (PARTITION BY term) on the same frame — one exchange to
    * term, one back to doc for the top-k window; no separate df agg
    * branch, no join. All shuffle-on-key; survives any corpus size. */
  val tfidfTerms = Q(
    "q_tfidf_terms",
    s"""WITH tf AS (
       |  SELECT doc_id, g AS term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($W) AS g FROM documents)
       |  GROUP BY doc_id, g
       |), df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT doc_id, term, tf.tf, df.df,
       |    CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score
       |  FROM tf JOIN df USING (term)
       |), ranked AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
       |  FROM scored
       |)
       |SELECT doc_id, term, tf, df, score, rk FROM ranked
       |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("score", expr("tf * 1000000 div df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "tf", "df", "score", "rk")
      .orderBy("doc_id", "rk")
  }

  /** Inverted index (term → doc postings) as a persisted
    * [[graft.sources.IndexCatalog]] artifact, stored BUCKETED on term —
    * the text-retrieval counterpart of the ANN tier's IvfIndex: built
    * once per (run, corpus), and every term lookup reads its bucket
    * with zero Exchange on the index side. At 100 TB the postings table
    * is the search-serving layout; the build is one explode + one
    * bucketed write. */
  private[graft] def invertedIndex(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import graft.sources.{BucketedTableSink, IndexCatalog}
    val key = s"inv_${IndexCatalog.tag(d)}"
    val table = IndexCatalog.tableName(s, key)
    IndexCatalog.ensure(s, key) { _ =>
      BucketedTableSink(8, Seq("term"))
        .write(invertedIndexPlan(s, d), table)
    }
    s.table(table)
  }

  /** The unexecuted postings plan (exposed for the hygiene sweep). */
  private[graft] def invertedIndexPlan(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))

  /** Term → documents retrieval from the persisted inverted index: the
    * keyword-search workload (exact postings, no scoring — ranked
    * retrieval composes q_tfidf_terms on top). */
  val textSearch = Q(
    "q_text_search",
    s"""SELECT term, doc_id FROM (
       |  SELECT doc_id, unnest(list_distinct($W)) AS term FROM documents
       |)
       |WHERE term IN ('scan', 'join', 'quantile')
       |ORDER BY term, doc_id""".stripMargin) { (s, d) =>
    invertedIndex(s, d)
      .filter(col("term").isin("scan", "join", "quantile"))
      .select("term", "doc_id")
      .orderBy("term", "doc_id")
  }

  /** Content fingerprinting: md5 over the sorted distinct token set;
    * bucket sizes reveal bag-of-words duplicates that exact-hash dedup
    * misses. */
  val fingerprintQ = Q(
    "q_text_fingerprint",
    s"""SELECT fp, count(*) AS n_docs, min(doc_id) AS first_doc FROM (
       |  SELECT doc_id,
       |    md5(array_to_string(list_sort(list_distinct($W)), ' ')) AS fp
       |  FROM documents
       |) GROUP BY fp ORDER BY fp""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("fp")
  }
}
