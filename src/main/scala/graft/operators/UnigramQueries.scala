package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** The second tokenizer family (round-10 verdict "what's missing"): a
  * unigram-LM-style lattice tokenizer — SentencePiece's other half,
  * next to the BPE trainer in [[ChunkingQueries]].
  *
  * Faithful-but-exact design: real unigram-LM training runs EM over
  * float piece log-probabilities, which no hash-exact oracle can
  * replay. This engine keeps the unigram-LM *structure* — seed a large
  * substring vocabulary, segment the corpus on the piece lattice,
  * prune to the pieces that earn their keep, re-segment under the
  * pruned vocabulary — but scores the lattice with exact integers:
  * corpus substring frequency in round 1 and realized piece usage
  * (the exact analog of EM's expected count) in round 2. The Viterbi
  * objective is lexicographic (fewest pieces, then highest total
  * score, then earliest split), a total order, so the segmentation is
  * deterministic and the DuckDB oracle replays BOTH rounds — vocab
  * seeding, the position-unrolled lattice DP, the usage prune, and the
  * final encode — CTE for CTE.
  *
  * Scale shape: the corpus is touched once (word counts); everything
  * downstream — candidate counting, both DP rounds, pruning — runs at
  * VOCABULARY size. The lattice DP is map-side: one fold over word
  * positions per distinct word ([[viterbiSeg]], higher-order
  * functions, no shuffle, no driver data) with the piece-score map
  * carried as a broadcast 1-row map column (seed ≈ chars + 256 pieces
  * — kilobytes). Per-document encode is the [[ChunkingQueries.bpeEncode]]
  * shape: positional word explode → vocabulary-sized broadcast join →
  * one doc_id hash-agg. Long-tail words (> [[MaxWordLen]] chars) price
  * as character pieces — the bounded lattice's honest contract, the
  * same convention as streaming OOV fallback in
  * [[graft.streaming.TokenizeStreams]].
  */
object UnigramQueries {

  /** Maximum piece length considered by seeding and the lattice. */
  final val PieceLen = 4

  /** Multi-character pieces admitted to the seed vocabulary. */
  final val SeedMulti = 256

  /** Multi-character pieces surviving the usage prune. */
  final val KeepMulti = 128

  /** Lattice cap: longer words segment as character pieces. */
  final val MaxWordLen = 16

  /** DuckDB fragment: whitespace tokens of `text`. */
  private val W = """string_split_regex(trim(text), '\s+')"""

  // -------------------------------------------------------------------
  // Spark side: map-side lattice DP
  // -------------------------------------------------------------------

  /** Best segmentation of word `w` under score map `vm`
    * (piece → BIGINT score): a fold over positions 1..len(w) building
    * the DP table as an array of (n_pieces, −score_sum, split_j, seg)
    * structs; the lexicographic struct MIN at each position is exactly
    * the (fewest pieces, highest score, earliest split) objective.
    * Every single character is in the vocabulary by construction, so
    * every position is reachable and the final entry always exists.
    * Runs entirely inside one projection — no shuffle, no UDF. */
  private[graft] def viterbiSeg(w: Column, vm: Column): Column = {
    val dp = aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0).as("n"), lit(0L).as("negs"),
                   lit(0).as("j"), lit("").as("seg"))),
      (acc: Column, i: Column) => concat(acc, array(array_min(
        filter(
          transform(sequence(greatest(lit(0), i - PieceLen), i - 1), j => {
            val piece = w.substr(j + 1, i - j)
            val sc = element_at(vm, piece)
            val prev = element_at(acc, j + 1)
            when(sc.isNotNull, struct(
              (prev("n") + 1).as("n"),
              (prev("negs") - sc).as("negs"),
              j.as("j"),
              concat(prev("seg"), lit(" "), piece).as("seg")))
          }),
          x => x.isNotNull)))))
    ltrim(element_at(dp, length(w) + 1)("seg"))
  }

  /** Character-piece fallback for words beyond the lattice cap. */
  private[graft] def charSeg(w: Column): Column =
    array_join(transform(sequence(lit(1), length(w)),
      i => w.substr(i, lit(1))), " ")

  private def segCol(w: Column, vm: Column): Column =
    when(length(w) > MaxWordLen, charSeg(w)).otherwise(viterbiSeg(w, vm))

  // -------------------------------------------------------------------
  // Trainer (persisted artifact, train-once/serve-many like BPE/IVF)
  // -------------------------------------------------------------------

  /** Artifact layout: `wc` (word counts), `seed` (round-1 vocabulary
    * with frequencies), `seg1` (round-1 segmentation — the usage
    * statistic's source), `pieces` (pruned vocabulary with freq +
    * usage), `vocab` (final per-word segmentation + token count).
    * Intermediates are materialized vocabulary-sized parquet for the
    * same reason the BPE trainer materializes per-step state. */
  private def unigramDirOf(s: SparkSession, d: String): String = {
    import graft.sources.IndexCatalog
    IndexCatalog.ensure(s, s"unigram_${IndexCatalog.tag(d)}",
        inputs = Seq(d),
        owners = Seq(UnigramQueries.getClass, Tables.getClass,
          graft.functions.TextFunctions.getClass)) { dir =>
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("wn"))
        .write.mode("overwrite").parquet(s"$dir/wc")
      val wc = s.read.parquet(s"$dir/wc")
      // candidate piece frequencies (lengths 1..PieceLen, all words)
      val freqs = wc
        .select(col("w"), col("wn"),
          explode(sequence(lit(1), lit(PieceLen))).as("k"))
        // Spark's sequence(1, 0) throws where DuckDB's range is empty
        .filter(length(col("w")) >= col("k"))
        .select(col("w"), col("wn"), col("k"),
          explode(sequence(lit(1), length(col("w")) - col("k") + 1)).as("i"))
        .select(col("w").substr(col("i"), col("k")).as("piece"), col("wn"))
        .groupBy("piece").agg(sum(col("wn")).as("freq"))
      val chars = freqs.filter(length(col("piece")) === 1)
      val seedMulti = freqs.filter(length(col("piece")) > 1)
        .orderBy(col("freq").desc, col("piece")).limit(SeedMulti)
      chars.unionByName(seedMulti)
        .write.mode("overwrite").parquet(s"$dir/seed")
      val seed = s.read.parquet(s"$dir/seed")
      // round 1: segment on the seed lattice, frequency-scored
      val vm1 = seed.agg(map_from_entries(
        collect_list(struct(col("piece"), col("freq")))).as("vm"))
      wc.crossJoin(broadcast(vm1))
        .select(col("w"), col("wn"), segCol(col("w"), col("vm")).as("seg"))
        .write.mode("overwrite").parquet(s"$dir/seg1")
      // usage = realized token-stream count per piece (EM-count analog)
      val usage = s.read.parquet(s"$dir/seg1")
        .select(col("wn"), explode(split(col("seg"), " ")).as("piece"))
        .groupBy("piece").agg(sum(col("wn")).as("n_used"))
      val keptChars = seed.filter(length(col("piece")) === 1)
        .join(usage, Seq("piece"), "left")
        .select(col("piece"), col("freq"),
          coalesce(col("n_used"), lit(0L)).as("n_used"))
      val keptMulti = seed.filter(length(col("piece")) > 1)
        .join(usage, Seq("piece"))
        .orderBy(col("n_used").desc, col("piece")).limit(KeepMulti)
        .select(col("piece"), col("freq"), col("n_used"))
      keptChars.unionByName(keptMulti)
        .write.mode("overwrite").parquet(s"$dir/pieces")
      // round 2: re-segment under the pruned, usage-scored vocabulary
      val kept = s.read.parquet(s"$dir/pieces")
      val vm2 = kept.agg(map_from_entries(
        collect_list(struct(col("piece"), col("n_used")))).as("vm"))
      wc.crossJoin(broadcast(vm2))
        .select(col("w"), col("wn"), segCol(col("w"), col("vm")).as("seg"))
        .select(col("w"), col("wn"), col("seg"),
          size(split(col("seg"), " ")).cast("long").as("n_tokens"))
        .write.mode("overwrite").parquet(s"$dir/vocab")
    }
  }

  /** The pruned vocabulary (piece, freq, n_used), artifact-served. */
  private[graft] def unigramPieces(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${unigramDirOf(s, d)}/pieces")

  /** Final per-word segmentation (w, wn, seg, n_tokens), artifact-served. */
  private[graft] def unigramVocab(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${unigramDirOf(s, d)}/vocab")

  // -------------------------------------------------------------------
  // Oracle: both rounds replayed, position-unrolled
  // -------------------------------------------------------------------

  /** One unrolled lattice DP (positions 1..MaxWordLen). Each step CTE
    * holds the per-word argmin at that position; candidates reach back
    * ≤ PieceLen positions, join the vocabulary CTE for the score, and
    * the row_number tie-break mirrors the Spark struct-min ordering
    * exactly ((n, −score, split) lexicographic). Every step is
    * MATERIALIZED: DuckDB 1.0 inlines plain CTEs per reference, and a
    * chain where step i re-expands up to PieceLen predecessors would
    * blow up exponentially (observed as a "too many open files"
    * parquet-scan explosion before evaluation even started). */
  private def dpCtes(pre: String, vocab: String, score: String): String = {
    val steps = (1 to MaxWordLen).map { i =>
      val branches = (math.max(0, i - PieceLen) until i).map { j =>
        s"""SELECT w, wn, n, negs, seg, $j AS j,
           |      substr(w, ${j + 1}, ${i - j}) AS piece
           |    FROM $pre$j WHERE len(w) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""$pre$i AS MATERIALIZED (
         |  SELECT w, wn, n, negs, seg FROM (
         |    SELECT p.w, p.wn, p.n + 1 AS n, p.negs - sc.$score AS negs,
         |      p.seg || ' ' || p.piece AS seg,
         |      row_number() OVER (PARTITION BY p.w
         |        ORDER BY p.n + 1, p.negs - sc.$score, p.j) AS rn
         |    FROM ($branches) p
         |    JOIN $vocab sc ON sc.piece = p.piece)
         |  WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""${pre}0 AS MATERIALIZED (
       |  SELECT w, wn, 0 AS n, CAST(0 AS BIGINT) AS negs, '' AS seg
       |  FROM uwc WHERE len(w) <= $MaxWordLen
       |),
       |$steps""".stripMargin
  }

  /** Per-word final segmentation: the DP row at position len(w), plus
    * the character fallback for words beyond the cap. */
  private def segPick(pre: String, out: String): String = {
    val branches = (1 to MaxWordLen)
      .map(i => s"SELECT w, wn, n, seg FROM $pre$i WHERE len(w) = $i")
      .mkString("\n    UNION ALL\n    ")
    s"""$out AS MATERIALIZED (
       |  SELECT w, wn, CAST(n AS BIGINT) AS n_tok, trim(seg) AS seg FROM (
       |    $branches)
       |  UNION ALL
       |  SELECT w, wn, CAST(len(w) AS BIGINT) AS n_tok,
       |    array_to_string([substr(w, CAST(i AS INT), 1)
       |                     for i in range(1, len(w) + 1)], ' ') AS seg
       |  FROM uwc WHERE len(w) > $MaxWordLen
       |)""".stripMargin
  }

  /** The whole trainer, CTE for CTE: word counts → candidate
    * frequencies → seed → round-1 DP (d0..dN) → usage → prune →
    * round-2 DP (e0..eN) → final segmentation. */
  private[operators] def unigramCtes: String =
    s"""uwc AS MATERIALIZED (
       |  SELECT w, count(*) AS wn FROM (
       |    SELECT unnest($W) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w
       |), ufreq AS MATERIALIZED (
       |  SELECT substr(w, CAST(i AS INT), CAST(k AS INT)) AS piece,
       |    CAST(sum(wn) AS BIGINT) AS freq
       |  FROM uwc,
       |    unnest(range(1, $PieceLen + 1)) AS l(k),
       |    unnest(range(1, len(w) + 1)) AS u(i)
       |  WHERE i + k - 1 <= len(w)
       |  GROUP BY 1
       |), useed AS MATERIALIZED (
       |  SELECT piece, freq FROM ufreq WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq FROM ufreq WHERE len(piece) > 1
       |    ORDER BY freq DESC, piece LIMIT $SeedMulti)
       |),
       |${dpCtes("d", "useed", "freq")},
       |${segPick("d", "useg1")},
       |uusage AS MATERIALIZED (
       |  SELECT piece, CAST(sum(wn) AS BIGINT) AS n_used FROM (
       |    SELECT wn, unnest(string_split(seg, ' ')) AS piece FROM useg1)
       |  GROUP BY piece
       |), ukept AS MATERIALIZED (
       |  SELECT s.piece, s.freq, coalesce(u.n_used, CAST(0 AS BIGINT)) AS n_used
       |  FROM useed s LEFT JOIN uusage u USING (piece)
       |  WHERE len(s.piece) = 1
       |  UNION ALL
       |  SELECT piece, freq, n_used FROM (
       |    SELECT s.piece, s.freq, u.n_used
       |    FROM useed s JOIN uusage u ON u.piece = s.piece
       |    WHERE len(s.piece) > 1
       |    ORDER BY u.n_used DESC, s.piece LIMIT $KeepMulti)
       |),
       |${dpCtes("e", "ukept", "n_used")},
       |${segPick("e", "useg2")}""".stripMargin

  // -------------------------------------------------------------------
  // Registered queries
  // -------------------------------------------------------------------

  /** The trained vocabulary: every kept piece with its seed frequency
    * and realized round-1 usage — the table a tokenizer release ships. */
  val unigramVocabQ = Q(
    "q_unigram_vocab",
    s"""WITH $unigramCtes
       |SELECT piece, CAST(len(piece) AS BIGINT) AS piece_len, freq, n_used
       |FROM ukept ORDER BY n_used DESC, piece""".stripMargin) { (s, d) =>
    unigramPieces(s, d)
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("freq"), col("n_used"))
      .orderBy(col("n_used").desc, col("piece"))
  }

  /** Corpus-wide encode under the trained unigram tokenizer — the
    * per-document token stream, same materialization contract as
    * [[ChunkingQueries.bpeEncode]]. */
  val unigramEncode = Q(
    "q_unigram_encode",
    s"""WITH $unigramCtes,
       |upieces AS (
       |  SELECT w, string_split(seg, ' ') AS p FROM useg2
       |), dw AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS i, ws[u.i] AS w
       |  FROM (SELECT doc_id, $W AS ws FROM documents),
       |       unnest(range(1, len(ws) + 1)) AS u(i)
       |  WHERE ws[u.i] <> ''
       |)
       |SELECT doc_id,
       |  CAST(len(flatten(list(p ORDER BY i))) AS BIGINT) AS n_tokens,
       |  array_to_string(flatten(list(p ORDER BY i)), ' ') AS uni_text
       |FROM dw JOIN upieces USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val vocab = unigramVocab(s, d)
      .select(col("w"), col("seg").as("ptxt"), col("n_tokens"))
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("i", "w")))
      .filter(col("w") =!= "")
      .join(vocab, Seq("w"))
      .groupBy("doc_id")
      .agg(sum(col("n_tokens")).as("n_tokens"),
        sort_array(collect_list(struct(col("i"), col("ptxt")))).as("ps"))
      .select(col("doc_id"), col("n_tokens"),
        array_join(expr("transform(ps, x -> x.ptxt)"), " ").as("uni_text"))
      .orderBy("doc_id")
  }

  /** Tokenizer bake-off: per-source compression of all THREE trained
    * tokenizers (BPE, unigram, WordPiece) over the same word stream —
    * the comparison that picks a tokenizer for a corpus mix. Three
    * vocabulary-sized broadcast joins; the oracle replays the full BPE
    * merge loop, both unigram rounds, AND the WordPiece train+greedy
    * unroll in one statement. */
  val tokBakeoff = Q(
    "q_tok_bakeoff",
    s"""WITH ${ChunkingQueries.bpeCtes},
       |$unigramCtes,
       |${WordPieceQueries.wpCtes},
       |btok AS (
       |  SELECT w, CAST(len(string_split(trim(syms, chr(31)),
       |    chr(31) || chr(31))) AS BIGINT) AS bpe_tok
       |  FROM v${ChunkingQueries.BpeMerges}
       |), dw AS (
       |  SELECT source, unnest($W) AS w FROM documents
       |)
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(b.bpe_tok) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(u.n_tok) AS BIGINT) AS n_uni_tokens,
       |  CAST(sum(t.n_tok) AS BIGINT) AS n_wp_tokens,
       |  CAST((1000 * sum(b.bpe_tok)) // count(*) AS BIGINT) AS bpe_per_kword,
       |  CAST((1000 * sum(u.n_tok)) // count(*) AS BIGINT) AS uni_per_kword,
       |  CAST((1000 * sum(t.n_tok)) // count(*) AS BIGINT) AS wp_per_kword
       |FROM (SELECT source, w FROM dw WHERE w <> '') d
       |JOIN btok b USING (w)
       |JOIN useg2 u USING (w)
       |JOIN wpseg t USING (w)
       |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val bpe = ChunkingQueries.bpeVocab(s, d)
      .select(col("w"), col("n_tokens").as("bpe_tok"))
    val uni = unigramVocab(s, d)
      .select(col("w"), col("n_tokens").as("uni_tok"))
    val wp = WordPieceQueries.wpVocab(s, d)
      .select(col("w"), col("n_tokens").as("wp_tok"))
    Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .join(bpe, Seq("w")).join(uni, Seq("w")).join(wp, Seq("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("bpe_tok")).as("n_bpe_tokens"),
        sum(col("uni_tok")).as("n_uni_tokens"),
        sum(col("wp_tok")).as("n_wp_tokens"),
        expr("(1000 * sum(bpe_tok)) div count(1)").as("bpe_per_kword"),
        expr("(1000 * sum(uni_tok)) div count(1)").as("uni_per_kword"),
        expr("(1000 * sum(wp_tok)) div count(1)").as("wp_per_kword"))
      .orderBy("source")
  }

  /** Sequence packing under the trained UNIGRAM tokenizer's counts —
    * the loader-manifest bridge [[ChunkingQueries.packSequencesBpe]]
    * provides for BPE, for the second tokenizer family: per-document
    * token counts from the `idx_unigram` vocabulary artifact
    * (vocabulary-sized broadcast join), then the same concat-and-chunk
    * into fixed 512-token sequences over the global
    * [[ShardPacking.packGlobal]] offset (hash-bucketed two-level
    * prefix sum — no corpus-wide window). The oracle replays both
    * training rounds, the application, and the identical permutation
    * as one windowed sum. */
  val packSequencesUni = Q(
    "q_pack_sequences_uni",
    s"""WITH $unigramCtes,
       |udt AS (
       |  SELECT doc_id, CAST(sum(t.n_tok) AS BIGINT) AS toks
       |  FROM (SELECT doc_id, unnest($W) AS w FROM documents) d
       |  JOIN useg2 t USING (w) WHERE d.w <> ''
       |  GROUP BY doc_id
       |), ut AS (
       |  SELECT doc_id, toks,
       |    ${ShardPacking.bucketSql("doc_id")} AS pack_bucket
       |  FROM udt WHERE toks > 0
       |), uc AS (
       |  SELECT doc_id, toks,
       |    CAST(coalesce(sum(toks) OVER (ORDER BY pack_bucket, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before
       |  FROM ut
       |), uspans AS (
       |  SELECT doc_id, toks, cum_before,
       |    unnest(range(cum_before // 512, (cum_before + toks - 1) // 512 + 1))
       |      AS seq
       |  FROM uc
       |)
       |SELECT seq, count(*) AS n_docs,
       |  CAST(sum(least(512 * (seq + 1), cum_before + toks)
       |           - greatest(512 * seq, cum_before)) AS BIGINT) AS toks,
       |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM uspans GROUP BY seq ORDER BY seq""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .join(unigramVocab(s, d).select("w", "n_tokens"), Seq("w"))
      .groupBy("doc_id").agg(sum("n_tokens").as("toks"))
      .filter(col("toks") > 0)
    ShardPacking.chunkSequences(t, L = 512L).drop("n_full_docs")
  }
}
