package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Sources

/** Harness registration for the NDJSON source surface (SURVEY §2.1
  * S1 + S3): a declared-schema ES-envelope scan over MULTIPLE day files
  * in one read, `log_date` stamped from the file name — exercised over a
  * small checked-in fixture (`data/interactions/2022040{1,2}.json`,
  * 15 ES-envelope rows per day) because the driver's sf-dirs carry no
  * JSON tables. The oracle reads the same files via DuckDB's
  * read_ndjson with the same filename-derived date. */
object SourceQueries {

  private val fixtureDays = Seq("20220401", "20220402")
  private val fixturePaths =
    fixtureDays.map(d => s"/root/repo/data/interactions/$d.json")

  val jsonMultiday = Q(
    "q_s1s3_json_multiday",
    s"""SELECT CAST(strptime(regexp_extract(filename, '(\\d{8})[^/]*$$', 1), '%Y%m%d') AS DATE) AS log_date,
       |  (_source).AppName AS app_name,
       |  count(*) AS n,
       |  CAST(SUM((_source).TotalDuration) AS BIGINT) AS total_dur
       |FROM read_ndjson([${fixturePaths.map(p => s"'$p'").mkString(", ")}], filename=true)
       |GROUP BY 1, 2 ORDER BY log_date, app_name""".stripMargin) { (s, _) =>
    // sfDir-independent: the JSON surface has its own checked-in fixture
    Sources.interactionLogs(s, fixturePaths)
      .groupBy(col("log_date"), col("AppName").as("app_name"))
      .agg(count(lit(1)).as("n"), sum(col("TotalDuration")).as("total_dur"))
      .orderBy("log_date", "app_name")
  }

  private val csvDays = Seq("20220401", "20220402")
  private val csvPaths = csvDays.map(d => s"/root/repo/data/csv/$d.csv")

  /** The CSV source surface: day-file warehouse dumps read in ONE
    * declared-schema scan ([[Sources.csvExports]] — no inference pass,
    * no per-day union loop), date from the file name, quoted embedded
    * commas parsed per RFC 4180. The oracle reads the same files via
    * DuckDB's read_csv with the same declared columns. */
  val csvMultiday = Q(
    "q_s9_csv_multiday",
    s"""SELECT CAST(strptime(regexp_extract(filename, '(\\d{8})[^/]*$$', 1), '%Y%m%d') AS DATE) AS log_date,
       |  app_name, count(*) AS n, CAST(SUM(duration) AS BIGINT) AS total_dur
       |FROM read_csv([${csvPaths.map(p => s"'$p'").mkString(", ")}],
       |  header=true, filename=true,
       |  columns={'contract': 'VARCHAR', 'app_name': 'VARCHAR',
       |           'duration': 'BIGINT'})
       |GROUP BY 1, 2 ORDER BY log_date, app_name""".stripMargin) { (s, _) =>
    // sfDir-independent: the CSV surface has its own checked-in fixture
    Sources.csvExports(s, csvPaths,
        "contract STRING, app_name STRING, duration BIGINT")
      .groupBy(col("log_date"), col("app_name"))
      .agg(count(lit(1)).as("n"), sum(col("duration")).as("total_dur"))
      .orderBy("log_date", "app_name")
  }

  /** The Avro source surface (round-9 verdict item 6 — completes the
    * JSON/Parquet/CSV/ORC/JDBC matrix): the corpus round-trips through
    * [[graft.sources.AvroTable]] — a distributed per-partition
    * container-file sink + a `binaryFile`-scan decode source built on
    * the Avro core library (no `spark-avro` DataSource module exists in
    * this environment) — and the per-(lang, source) rollup over the
    * re-read rows must equal the same rollup DuckDB computes over the
    * original parquet. Sums over doc_id, n_chars AND text length prove
    * content (not just row-count) fidelity through the
    * encode→container→decode path. The fixture persists per (run,
    * corpus) through the catalog, so serving reads the committed
    * container files rather than re-encoding per query. */
  /** Builds (or adopts) the avro DOCS fixture and returns its table
    * dir. Exposed separately from the query so Bench's build phase can
    * materialize it up front (an `idx_*` entry): round-10's transient
    * `q_s11_avro_vec` bench failure came from serving lazily building
    * its fixture — pre-built, serving passes are read-only. */
  def avroDocsFixture(s: org.apache.spark.sql.SparkSession, d: String): String = {
    import graft.sources.{AvroTable, IndexCatalog}
    val dir = IndexCatalog.ensure(s, s"avro_docs_${IndexCatalog.tag(d)}",
        inputs = Seq(d),
        owners = Seq(AvroTable.getClass, graft.Tables.getClass)) { dir =>
      AvroTable.write(
        graft.Tables.documents(s, d)
          .select("doc_id", "text", "lang", "source", "n_chars"),
        s"$dir/docs")
      IndexCatalog.declareIds("avro", "docs", Seq("doc_id"))
    }
    s"$dir/docs"
  }

  /** Builds (or adopts) the avro VECS fixture; see [[avroDocsFixture]]. */
  def avroVecsFixture(s: org.apache.spark.sql.SparkSession, d: String): String = {
    import graft.sources.{AvroTable, IndexCatalog}
    val dir = IndexCatalog.ensure(s, s"avro_vecs_${IndexCatalog.tag(d)}",
        inputs = Seq(d),
        owners = Seq(AvroTable.getClass, graft.Tables.getClass)) { dir =>
      AvroTable.write(graft.Tables.embeddings(s, d), s"$dir/vecs")
      IndexCatalog.declareIds("avro", "vecs", Seq("vec_id"))
    }
    s"$dir/vecs"
  }

  val avroRoundTrip = Q(
    "q_s10_avro",
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_len
      |FROM documents
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, d) =>
    graft.sources.AvroTable.read(s, avroDocsFixture(s, d))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("sum_id"),
        sum("n_chars").as("sum_chars"),
        sum(length(col("text"))).as("sum_len"))
      .orderBy("lang", "source")
  }

  /** The VECTOR surface through Avro: the `array<float>` embedding
    * column round-trips the [[graft.sources.AvroTable]] encode →
    * container → decode path (Avro ARRAY of FLOAT), and the rollup —
    * row count, id sum, total dimension count, and a floor-scaled sum
    * over the first component (float → double exactly, ×10⁶, floor:
    * IEEE-identical in both engines, no direct double→int cast whose
    * rounding convention differs) — must match DuckDB over the
    * original parquet. Same per-(run, corpus) fixture lifecycle as
    * [[avroRoundTrip]]. */
  val avroVecRoundTrip = Q(
    "q_s11_avro_vec",
    """SELECT count(*) AS n_vecs,
      |  CAST(sum(vec_id) AS BIGINT) AS sum_id,
      |  CAST(sum(len(embedding)) AS BIGINT) AS sum_dims,
      |  CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
      |                AS BIGINT)) AS BIGINT) AS sum_c1
      |FROM embeddings""".stripMargin) { (s, d) =>
    graft.sources.AvroTable.read(s, avroVecsFixture(s, d))
      .agg(count(lit(1)).as("n_vecs"),
        sum("vec_id").as("sum_id"),
        sum(size(col("embedding"))).as("sum_dims"),
        sum(floor(element_at(col("embedding"), 1).cast("double") * 1000000)
          .cast("long")).as("sum_c1"))
  }
}
