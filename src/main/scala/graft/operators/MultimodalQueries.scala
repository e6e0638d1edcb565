package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.multimodal.Multimodal

/** Query surface for the multimodal plumbing. The decode stub is
  * deterministic arithmetic over an md5 digest, so even the
  * `mapPartitions` path gets a full DuckDB oracle — the plumbing
  * (binary column, partition-local decoder lifecycle, typed output
  * schema) is verified end to end. */
object MultimodalQueries {

  /** hex-digit value of md5-char `i` (1-based) in DuckDB SQL. */
  private def hex(i: Int) = s"(strpos('0123456789abcdef', h[$i]) - 1)"

  val decodeMeta = Q(
    "q_mm_decode",
    s"""WITH m AS (SELECT doc_id, md5(text) AS h,
       |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len FROM documents)
       |SELECT doc_id, byte_len,
       |  CAST(64 + ((16 * ${hex(1)} + ${hex(2)}) % 192) * 10 AS INTEGER) AS width,
       |  CAST(64 + ((16 * ${hex(3)} + ${hex(4)}) % 108) * 10 AS INTEGER) AS height,
       |  h AS digest
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal
      .decodeAll(s, Multimodal.withPayload(Tables.documents(s, d)))
      .toDF()
      .orderBy("doc_id")
  }
}
