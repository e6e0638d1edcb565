package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** Context-window preparation for LLM training — the step between a
  * curated corpus and a token stream: documents split into fixed-size
  * overlapping chunks with provenance, and the length profile that
  * prices padding waste in length-bucketed batching.
  *
  * Scale shape: both queries are one corpus scan + per-row generation /
  * one hash-agg — no joins, no windows, no driver data. Chunking output
  * volume is corpus × (size/stride) overlap factor by construction
  * (4/3 here), never quadratic; every expression is codegen'd
  * (`sequence`/`slice`/`size` builtins on the split token array). */
object ChunkingQueries {

  /** Window geometry: 64-token chunks every 48 tokens → 16-token
    * overlap, the classic boundary-context carry. Chunk starts are
    * 0, 48, 96, … strictly below the document's token count, so every
    * token is covered, tail chunks may run short, and an empty document
    * yields exactly one empty chunk (the whitespace-split of "" is a
    * single empty token — same in DuckDB; ChunkingSpec pins the whole
    * boundary grid: empty/1/48/49/64/97/112-token documents). */
  final val ChunkSize = 64
  final val ChunkStride = 48

  /** DuckDB fragment: whitespace tokens of `text`. */
  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Sliding-window chunking with provenance: (doc_id, start, n_tokens,
    * chunk_text) — the map a packing/tokenization stage consumes, and
    * the provenance a contamination hit traces back through. */
  val chunkOverlap = Q(
    "q_chunk_overlap",
    s"""WITH t AS (SELECT doc_id, $W AS w FROM documents)
       |SELECT doc_id, CAST(s AS BIGINT) AS start,
       |  CAST(least($ChunkSize, len(w) - s) AS BIGINT) AS n_tokens,
       |  array_to_string(w[s + 1 : s + $ChunkSize], ' ') AS chunk_text
       |FROM t, unnest(range(0, len(w), $ChunkStride)) AS u(s)
       |ORDER BY doc_id, start""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 1, lit(ChunkStride)))
          .as("start"))
      .select(
        col("doc_id"),
        col("start").cast("long").as("start"),
        least(lit(ChunkSize), size(col("w")) - col("start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("w"), col("start") + 1, lit(ChunkSize)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "start")
  }

  /** BPE first-merge statistic: adjacent character-pair frequencies
    * across the corpus vocabulary, weighted by word occurrence count —
    * the quantity byte-pair-encoding training maximizes at every merge
    * step. Top-20 with deterministic tie-break; the full iterative
    * trainer is this query re-run on a re-paired vocabulary per merge.
    *
    * Scale shape: one corpus scan → vocabulary-sized hash-agg (the
    * word-count frame) → per-word pair explode bounded by word length →
    * pair-vocabulary hash-agg → top-k. Nothing corpus-quadratic; the
    * heavy reduction happens at the (small) vocabulary, not the corpus.
    * ASCII/BMP text assumed (Spark counts UTF-16 units, DuckDB code
    * points — equal on the basic plane). */
  val bpePairs = Q(
    "q_bpe_pairs",
    s"""WITH wc AS (
       |  SELECT w, count(*) AS wn FROM (
       |    SELECT unnest($W) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w
       |)
       |SELECT substr(w, CAST(i AS INT), 2) AS pair,
       |  CAST(sum(wn) AS BIGINT) AS n
       |FROM wc, unnest(range(1, len(w))) AS u(i)
       |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin) { (s, d) =>
    val wc = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wn"))
    wc
      // Spark's sequence(1, 0) throws on 1-char words; DuckDB's
      // range(1, 1) is just empty — filter to keep the sides equal
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("wn"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("wn"))
      .groupBy("pair").agg(sum(col("wn")).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)
  }

  /** Bucket width for the length profile: 16 tokens. */
  final val BucketWidth = 16

  /** Length-bucketed batching profile: documents grouped into
    * width-[[BucketWidth]] token-length buckets, with the padding cost
    * of batching each bucket to its own observed maximum —
    * `padding_tokens = max·count − sum`, the tokens a per-bucket
    * pad-to-longest collator burns. The profile is what picks bucket
    * boundaries for a real batcher: wide buckets waste pad, narrow
    * buckets starve batches. All-integer, hash-stable. */
  val lengthBuckets = Q(
    "q_length_buckets",
    s"""WITH t AS (SELECT len($W) AS n FROM documents)
       |SELECT n // $BucketWidth AS bucket, count(*) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS sum_tokens,
       |  CAST(max(n) AS BIGINT) AS max_tokens,
       |  CAST(max(n) * count(*) - sum(n) AS BIGINT) AS padding_tokens
       |FROM t GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select((size(tokens(col("text")))).cast("long").as("n"))
      // integral div (Divide would widen to double): n ≥ 0, so div == //
      .groupBy(expr(s"n div $BucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n")).as("sum_tokens"),
           max(col("n")).as("max_tokens"),
           (max(col("n")) * count(lit(1)) - sum(col("n")))
             .as("padding_tokens"))
      .orderBy("bucket")
  }
}
