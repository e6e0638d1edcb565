package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions._
import graft.plans.CosineSimilarity.cosineSim

/** Deduplication operator family for the training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
  * bucket-join → verify), SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup detection.
  *
  * Scale design: every variant is a pure shuffle-on-key pipeline — no
  * driver collects, no cross joins except the documented O(n²) baseline.
  * At 100 TB the LSH band join is the only pair generator (candidates per
  * band bucket), and the verify step bounds false positives; the all-pairs
  * baseline exists only as a small-data oracle for recall measurement.
  */
object DedupQueries {

  /** DuckDB fragment: whitespace tokens of `text`. */
  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Exact dedup via normalized-content hash, aggregated per source —
    * the summary a 100 TB corpus pass reports (docs vs unique docs). */
  val exactSummary = Q(
    "q_dedup_exact",
    s"""SELECT source, count(*) AS n_docs,
       |  count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS n_unique
       |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(normalized(col("text")))).as("n_unique"))
      .orderBy("source")
  }

  /** Exact dedup keep-policy on a key with real duplicates: group by
    * (user_id, props), keep the earliest event_id, count the copies. */
  val exactKeepFirst = Q(
    "q_dedup_exact_keep",
    """SELECT user_id, props, min(event_id) AS keep_id, count(*) AS n_copies
      |FROM events GROUP BY user_id, props HAVING count(*) > 1
      |ORDER BY user_id, props""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id", "props")
      .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy("user_id", "props")
  }

  /** MinHash signature dump (8 components over word 2-shingles) plus the
    * derived LSH band keys — the per-document state the LSH join uses. */
  val minhashSignature = Q(
    "q_dedup_minhash_sig",
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] AS shingles
       |  FROM (SELECT doc_id, $W AS w FROM documents)
       |)
       |SELECT doc_id,
       |  list_aggregate(list_transform(shingles, x -> md5('0|' || x)), 'min') AS h0,
       |  list_aggregate(list_transform(shingles, x -> md5('1|' || x)), 'min') AS h1,
       |  list_aggregate(list_transform(shingles, x -> md5('2|' || x)), 'min') AS h2,
       |  list_aggregate(list_transform(shingles, x -> md5('3|' || x)), 'min') AS h3
       |FROM sh ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withShingles = Tables.documents(s, d)
      .select(col("doc_id"), wordShingles(tokens(col("text")), 2).as("shingles"))
    withShingles.select(
      col("doc_id") +:
        (0 to 3).map(i => arrayMinhash(i, col("shingles")).as(s"h$i")): _*)
      .orderBy("doc_id")
  }

  /** MinHash + LSH near-dup pipeline, end to end: distinct-word sets →
    * 8 salted minhashes → 4 bands × 2 hashes → band-bucket self-join for
    * candidates → exact Jaccard verification at 0.8.
    *
    * This is the 100 TB shape: the only pair generator is the equi-join on
    * (band, key) — shuffle by band key, never n². */
  val minhashLshPairs = Q(
    "q_dedup_minhash_lsh",
    s"""WITH words AS (
       |  SELECT doc_id, list_distinct($W) AS ws FROM documents
       |), sig AS (
       |  SELECT doc_id, ws,
       |    md5(list_aggregate(list_transform(ws, x -> md5('0|' || x)), 'min')
       |     || list_aggregate(list_transform(ws, x -> md5('1|' || x)), 'min')) AS b0,
       |    md5(list_aggregate(list_transform(ws, x -> md5('2|' || x)), 'min')
       |     || list_aggregate(list_transform(ws, x -> md5('3|' || x)), 'min')) AS b1,
       |    md5(list_aggregate(list_transform(ws, x -> md5('4|' || x)), 'min')
       |     || list_aggregate(list_transform(ws, x -> md5('5|' || x)), 'min')) AS b2,
       |    md5(list_aggregate(list_transform(ws, x -> md5('6|' || x)), 'min')
       |     || list_aggregate(list_transform(ws, x -> md5('7|' || x)), 'min')) AS b3
       |  FROM words
       |), bands AS (
       |  SELECT doc_id, ws, 0 AS band, b0 AS key FROM sig
       |  UNION ALL SELECT doc_id, ws, 1, b1 FROM sig
       |  UNION ALL SELECT doc_id, ws, 2, b2 FROM sig
       |  UNION ALL SELECT doc_id, ws, 3, b3 FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.ws AS wa, b.ws AS wb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  len(list_intersect(wa, wb)) * 1.0
       |    / (len(wa) + len(wb) - len(list_intersect(wa, wb))) AS jaccard
       |FROM cand
       |WHERE len(list_intersect(wa, wb)) * 1.0
       |    / (len(wa) + len(wb) - len(list_intersect(wa, wb))) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val words = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("ws"))
    val sig = words.select(
      Seq(col("doc_id"), col("ws")) ++ (0 to 3).map { b =>
        md5(concat(arrayMinhash(2 * b, col("ws")), arrayMinhash(2 * b + 1, col("ws"))))
          .as(s"b$b")
      }: _*)
    val bands = (0 to 3).map { b =>
      sig.select(col("doc_id"), col("ws"), lit(b).as("band"), col(s"b$b").as("key"))
    }.reduce(_ unionByName _)
    val a = bands.select(col("doc_id").as("doc_a"), col("ws").as("wa"),
                         col("band"), col("key"))
    val bb = bands.select(col("doc_id").as("doc_b"), col("ws").as("wb"),
                          col("band"), col("key"))
    val cand = a.join(bb, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "wa", "wb")
      .distinct()
    val inter = size(array_intersect(col("wa"), col("wb")))
    val jac = inter.cast("double") / (size(col("wa")) + size(col("wb")) - inter)
    cand
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash signatures (16-bit, string-rendered) with collision-bucket
    * sizes — documents sharing a bucket are near-dup candidates. */
  val simhashBuckets = Q(
    "q_dedup_simhash",
    """WITH sig AS (
      |  SELECT doc_id,
      |    array_to_string(
      |      [CASE WHEN list_sum([CASE WHEN md5(w)[j] >= '8' THEN 1 ELSE -1 END
      |                           for w in string_split_regex(trim(text), '\s+')]) > 0
      |            THEN '1' ELSE '0' END for j in range(1, 17)],
      |      '') AS simhash
      |  FROM documents
      |)
      |SELECT simhash, count(*) AS n_docs, min(doc_id) AS first_doc
      |FROM sig GROUP BY simhash ORDER BY simhash""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), simhash16(tokens(col("text"))).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("simhash")
  }

  /** O(n²) exact n-gram (unigram-set) Jaccard baseline — the recall oracle
    * for the LSH pipeline above. Banner: only valid at small n; at scale
    * the LSH query replaces it. */
  val jaccardAllPairs = Q(
    "q_dedup_jaccard_pairs",
    s"""WITH words AS (SELECT doc_id, list_distinct($W) AS ws FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  len(list_intersect(a.ws, b.ws)) * 1.0
       |    / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jaccard
       |FROM words a JOIN words b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.ws, b.ws)) * 1.0
       |    / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val words = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("ws"))
    val a = words.select(col("doc_id").as("doc_a"), col("ws").as("wa"))
    val b = words.select(col("doc_id").as("doc_b"), col("ws").as("wb"))
    val inter = size(array_intersect(col("wa"), col("wb")))
    val jac = inter.cast("double") / (size(col("wa")) + size(col("wb")) - inter)
    a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs (threshold tuned to this corpus's
    * cosine range; the vectors are near-orthogonal so 0.45 marks true
    * outlier similarity). Exact double arithmetic keeps parity with the
    * oracle's list_dot_product. */
  val embeddingPairs = Q(
    "q_dedup_embedding",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_dot_product(a.e, b.e)
      |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.e, b.e)
      |    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d)
    val a = v.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = v.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosineSim(col("ea"), col("eb")))
      .filter(col("cosine") >= 0.45)
      .select("vec_a", "vec_b", "cosine")
      .orderBy("vec_a", "vec_b")
  }
}
