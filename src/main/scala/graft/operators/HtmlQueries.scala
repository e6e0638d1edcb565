package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.{tokens, StopwordTable}

/** Markup-extraction tier — the stage every real 100 TB crawl pipeline
  * runs FIRST (a web corpus arrives as HTML, not clean text; RefinedWeb
  * §3.1 "text extraction", trafilatura/jusText-class): strip markup,
  * split the page into blocks, and keep only content blocks, judging
  * each by word count and LINK DENSITY (navigation, related-links and
  * footer blocks are mostly anchor text — the jusText signal).
  *
  * The synthetic corpus ships clean `text`, so the tier wraps each
  * document in deterministic HTML first — a closed-form page the oracle
  * replays exactly (r15 verdict item 4):
  *
  *  - a constant nav block (3 links, 3 words — dropped by word count);
  *  - the text in 15-word `<p>` paragraphs; every 3rd paragraph wraps
  *    its first word in an inline link (a mixed block: low density,
  *    KEPT — pins that the density rule measures, not just detects);
  *  - a "related links" block of the document's first 5 words as
  *    anchors plus 5 plain words (≥5 words, so only the DENSITY rule
  *    can drop it — and whether it drops depends on the document's own
  *    word lengths, both engines agreeing);
  *  - a constant link-heavy footer (dropped by word count).
  *
  * The EXTRACTOR sees only the html string: split on newline into
  * blocks; per block `txt = strip(<[^>]*>)`, `ltxt = all <a> inner
  * text`, keep iff `words(txt) >= 5 AND 10·len(ltxt) <= 3·len(txt)`
  * (link density ≤ 0.3, integer-exact). Per document it reports block
  * and word accounting plus the md5 fingerprint of the kept text in
  * block order (NULL when nothing survives — md5 of no content is no
  * content, the [[BoilerplateQueries]] convention).
  *
  * Scale shape: wrap and extract are one map-only pass (regex inside
  * whole-stage codegen) + one per-doc hash-agg; the quality composition
  * adds one token-grain hash-agg and one |sources|-row rollup. No
  * joins, no windows — at 100 TB this is scan-bound, exactly what an
  * extraction tier must be.
  */
object HtmlQueries {

  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Words per paragraph. */
  private[graft] val ParaWords = 15

  private val NavHtml = """<div class="nav"><a href="/">Home</a> """ +
    """<a href="/about">About</a> <a href="/contact">Contact</a></div>"""
  private val FooterHtml = """<div class="footer"><a href="/archive">""" +
    """archive</a> <a href="/terms">terms</a> site</div>"""
  private val RelTail = " read more here now too</div>"

  /** Spark column: the deterministic HTML page for a word-array column
    * `w` (see object scaladoc for the layout). */
  private[graft] def htmlOf: Column = {
    val paras = expr(
      s"""transform(sequence(0, (size(w) + ${ParaWords - 1}) div $ParaWords - 1),
         |  i -> CASE WHEN i % 3 = 2 THEN
         |    concat('<p><a href="/t/', array_join(slice(w, i*$ParaWords + 1, 1), ''),
         |           '">', array_join(slice(w, i*$ParaWords + 1, 1), ''), '</a> ',
         |           array_join(slice(w, i*$ParaWords + 2, ${ParaWords - 1}), ' '), '</p>')
         |  ELSE
         |    concat('<p>', array_join(slice(w, i*$ParaWords + 1, $ParaWords), ' '), '</p>')
         |  END)""".stripMargin)
    val rel = concat(
      lit("""<div class="rel">"""),
      expr("""array_join(transform(slice(w, 1, 5),
             |  x -> concat('<a href="/r/', x, '">', x, '</a>')), ' ')""".stripMargin),
      lit(RelTail))
    concat(lit(NavHtml), lit("\n"), array_join(paras, "\n"), lit("\n"),
      rel, lit("\n"), lit(FooterHtml))
  }

  /** DuckDB: the same page from the word list `w`. (No continuation
    * line may start with `|` — this fragment nests under two more
    * stripMargin layers on its way into the query SQL.) */
  private def htmlSql: String = {
    val p = ParaWords
    s"""'$NavHtml' || chr(10) ||
       |array_to_string(list_transform(range((len(w) + ${p - 1}) // $p),
       |  i -> CASE WHEN i % 3 = 2 THEN
       |    '<p><a href="/t/' || w[i*$p + 1] || '">' || w[i*$p + 1] || '</a> ' ||
       |    coalesce(array_to_string(w[(i*$p + 2):(i*$p + $p)], ' '), '') || '</p>'
       |  ELSE '<p>' || array_to_string(w[(i*$p + 1):(i*$p + $p)], ' ') || '</p>'
       |  END), chr(10)) || chr(10) ||
       |'<div class="rel">' ||
       |array_to_string(list_transform(w[1:5],
       |  x -> '<a href="/r/' || x || '">' || x || '</a>'), ' ') ||
       |'$RelTail' || chr(10) || '$FooterHtml'""".stripMargin
  }

  /** Per-(doc, block) extraction frame: bi, txt, lc, tc, wc, kept —
    * the shared kernel of both queries. Input needs (doc_id, source,
    * w). */
  private[graft] def blocksOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("html", htmlOf)
      .select(col("doc_id"), col("source"),
        posexplode(split(col("html"), "\n")).as(Seq("bi", "block")))
      .withColumn("txt", regexp_replace(col("block"), "<[^>]*>", ""))
      .withColumn("ltxt", expr(
        """array_join(regexp_extract_all(block, '<a [^>]*>([^<]*)</a>', 1), '')"""))
      .withColumn("lc", length(col("ltxt")).cast("long"))
      .withColumn("tc", length(col("txt")).cast("long"))
      .withColumn("wc", size(split(trim(col("txt")), "\\s+")).cast("long"))
      .withColumn("kept", col("wc") >= 5 && lit(10) * col("lc") <= lit(3) * col("tc"))

  /** Shared DuckDB CTEs: page build + block split + per-block judge. */
  private def blockCtes: String =
    s"""base AS (SELECT doc_id, source, $W AS w
       |         FROM documents WHERE len($W) >= 1),
       |pg AS (SELECT doc_id, source, $htmlSql AS html FROM base),
       |bls AS (SELECT doc_id, source, string_split(html, chr(10)) AS bl FROM pg),
       |bix AS (SELECT doc_id, source, bl, unnest(range(len(bl))) AS bi FROM bls),
       |blk AS (SELECT doc_id, source, bi, bl[bi + 1] AS block FROM bix),
       |jb AS (
       |  SELECT doc_id, source, bi,
       |    regexp_replace(block, '<[^>]*>', '', 'g') AS txt,
       |    coalesce(length(array_to_string(
       |      regexp_extract_all(block, '<a [^>]*>([^<]*)</a>', 1), '')), 0) AS lc
       |  FROM blk
       |),
       |jd AS (
       |  SELECT doc_id, source, bi, txt,
       |    CAST(length(txt) AS BIGINT) AS tc, CAST(lc AS BIGINT) AS lc,
       |    CAST(len(string_split_regex(trim(txt), '\\s+')) AS BIGINT) AS wc
       |  FROM jb
       |),
       |kb AS (
       |  SELECT doc_id, source, bi, txt, tc, lc, wc,
       |    wc >= 5 AND 10 * lc <= 3 * tc AS kept
       |  FROM jd
       |)""".stripMargin

  /** Per-document extraction accounting: blocks seen/kept, raw vs
    * extracted word mass, and the kept-content fingerprint. */
  val htmlExtract = Q(
    "q_html_extract",
    s"""WITH $blockCtes
       |SELECT doc_id, n_blocks, n_kept, words_raw, words_kept,
       |  CASE WHEN n_kept = 0 THEN NULL ELSE md5(kept_txt) END AS extract_fp
       |FROM (
       |  SELECT doc_id,
       |    count(*) AS n_blocks,
       |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(sum(wc) AS BIGINT) AS words_raw,
       |    CAST(sum(CASE WHEN kept THEN wc ELSE 0 END) AS BIGINT) AS words_kept,
       |    string_agg(txt, ' ' ORDER BY bi) FILTER (WHERE kept) AS kept_txt
       |  FROM kb GROUP BY doc_id
       |) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("w", tokens(col("text"))).filter(size(col("w")) >= 1)
    blocksOf(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("wc")).as("words_raw"),
        sum(when(col("kept"), col("wc")).otherwise(0L)).as("words_kept"),
        sort_array(collect_list(
          when(col("kept"), struct(col("bi"), col("txt"))))).as("ps"))
      .withColumn("extract_fp",
        when(col("n_kept") === 0, lit(null).cast("string"))
          .otherwise(md5(array_join(
            transform(col("ps"), p => p.getField("txt")), " "))))
      .select("doc_id", "n_blocks", "n_kept", "words_raw", "words_kept",
        "extract_fp")
      .orderBy("doc_id")
  }

  /** Extraction FEEDING the quality gate (the v2 pipeline's rule set,
    * [[PipelineV2Queries]] stage 2, over the EXTRACTED token stream):
    * per source, how many documents come out of the extractor with any
    * content, and how many of those pass the Gopher-subset rules — the
    * crawl-in/clean-out acceptance curve of the markup tier. */
  val htmlQuality = Q(
    "q_html_quality",
    s"""WITH $blockCtes,
       |ktok AS (
       |  SELECT doc_id, source, unnest(string_split_regex(trim(txt), '\\s+')) AS t
       |  FROM kb WHERE kept
       |),
       |ktc AS (SELECT doc_id, source, t, count(*) AS cnt
       |        FROM ktok GROUP BY doc_id, source, t),
       |kds AS (
       |  SELECT doc_id, source,
       |    CAST(sum(cnt) AS BIGINT) AS n_words,
       |    CAST(max(cnt) AS BIGINT) AS max_cnt,
       |    CAST(sum(cnt * length(t)) AS BIGINT) AS total_chars,
       |    CAST(sum(CASE WHEN t IN (${swIn}) THEN cnt ELSE 0 END) AS BIGINT)
       |      AS sw_toks,
       |    CAST(sum(CASE WHEN length(t) < 3 THEN cnt ELSE 0 END) AS BIGINT)
       |      AS n_short
       |  FROM ktc GROUP BY doc_id, source
       |)
       |SELECT source,
       |  count(*) AS n_extracted,
       |  CAST(sum(CASE WHEN n_words BETWEEN 50 AND 100000
       |    AND 3 * n_words <= total_chars AND total_chars <= 10 * n_words
       |    AND 5 * max_cnt <= n_words AND sw_toks >= 2
       |    AND 5 * n_short <= n_words THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_quality_pass,
       |  CAST(sum(n_words) AS BIGINT) AS extracted_words
       |FROM kds GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("w", tokens(col("text"))).filter(size(col("w")) >= 1)
    val swList = StopwordTable("en")
    val kds = blocksOf(docs)
      .filter(col("kept"))
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("txt")), "\\s+")).as("t"))
      .groupBy("doc_id", "source", "t").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "source")
      .agg(sum("cnt").as("n_words"), max("cnt").as("max_cnt"),
        sum(col("cnt") * length(col("t"))).as("total_chars"),
        sum(when(col("t").isin(swList: _*), col("cnt")).otherwise(0L))
          .as("sw_toks"),
        sum(when(length(col("t")) < 3, col("cnt")).otherwise(0L))
          .as("n_short"))
    kds.groupBy("source")
      .agg(count(lit(1)).as("n_extracted"),
        sum(when(
          col("n_words").between(50, 100000) &&
            lit(3) * col("n_words") <= col("total_chars") &&
            col("total_chars") <= lit(10) * col("n_words") &&
            lit(5) * col("max_cnt") <= col("n_words") &&
            col("sw_toks") >= 2 && lit(5) * col("n_short") <= col("n_words"),
          1L).otherwise(0L)).as("n_quality_pass"),
        sum("n_words").as("extracted_words"))
      .orderBy("source")
  }

  private def swIn = StopwordTable("en").map(w => s"'$w'").mkString(", ")
}
