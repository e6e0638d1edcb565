package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ingest robustness: corrupt NDJSON lines are quarantined (not
  * silently nulled, not job-fatal), and the JDBC source round-trips
  * the sink's output — including the partitioned parallel pull. */
class SourceRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("lenient NDJSON ingest splits clean rows from quarantined lines") {
    val dir = Files.createTempDirectory("graft_lenient")
    val f = dir.resolve("20220401.json")
    Files.write(f, java.util.Arrays.asList(
      """{"_index":"history","_type":"kplus","_id":"a","_score":0,"_source":{"Contract":"C1","Mac":"M","TotalDuration":10,"AppName":"KPLUS"}}""",
      """{"broken json""",
      """{"_index":"history","_type":"vod","_id":"b","_score":0,"_source":{"Contract":"C2","Mac":"M","TotalDuration":20,"AppName":"VOD"}}""",
      """not json at all"""))
    val raw = Sources.interactionLogsLenient(spark, Seq(f.toString)).cache()
    try {
      val good = raw.filter(col("_corrupt").isNull).select(col("_source.*"))
      val bad = raw.filter(col("_corrupt").isNotNull)
        .select(col("_corrupt").as("raw"))
      assert(good.count() == 2)
      assert(good.select("Contract").as[String].collect().toSet == Set("C1", "C2"))
      val quarantined = bad.as[String].collect().toSet
      assert(quarantined == Set("""{"broken json""", "not json at all"),
        s"got $quarantined")
      // and the strict declared-schema reader would have nulled them:
      // the lenient path exists precisely to make the loss visible
      assert(Sources.interactionLogs(spark, Seq(f.toString)).count() == 4)
    } finally raw.unpersist()
  }

  test("JDBC source reads back the sink's table, partitioned pull included") {
    val dbDir = Files.createTempDirectory("graft_derby_src").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val sink = JdbcSink(url, user = "", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", truncate = false)
    val rows = (1L to 100L).map(i => (i, s"c$i")).toDF("id", "payload")
    sink.write(rows, "roundtrip")

    val plain = Sources.readJdbc(spark, url, "roundtrip")
    assert(plain.count() == 100)

    val parallel = Sources.readJdbc(spark, url, "roundtrip",
      partition = Some(("id", 1L, 100L, 4)))
    assert(parallel.rdd.getNumPartitions == 4,
      "partitioned pull must run as 4 range cursors")
    assert(parallel.count() == 100)
    assert(parallel.agg(sum("id")).collect()(0).getLong(0) == 5050L)
  }

  test("CSV day-file source: declared schema, RFC-4180 quotes, filename date") {
    val rows = Sources.csvExports(spark,
      Seq("/root/repo/data/csv/20220401.csv", "/root/repo/data/csv/20220402.csv"),
      "contract STRING, app_name STRING, duration BIGINT")
    assert(rows.count() == 23) // 12 + 11 data rows, headers skipped
    // quoted embedded comma stays ONE field
    assert(rows.filter(col("app_name") === "VOD, PREMIUM").count() == 2)
    // log_date from the file name, one value per day file
    val dates = rows.select("log_date").distinct()
      .as[java.sql.Date].collect().map(_.toString).sorted
    assert(dates.toSeq == Seq("2022-04-01", "2022-04-02"))
    // declared schema ⇒ typed column with no inference scan
    assert(rows.schema("duration").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("ORC round-trips the documents slice with pushdown at the scan") {
    val dir = Files.createTempDirectory("graft_orc").resolve("docs")
    val src = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars")
    src.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "ORC round trip changed the data")
    // predicate reaches the ORC scan (same contract as parquet S2)
    val plan = back.filter(col("doc_id") < 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      s"filter not pushed to the ORC scan:\n$plan")
  }

  test("Avro round-trips the documents slice, nulls and all (r9 item 6)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_avro").resolve("docs").toString
    val src = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
    AvroTable.write(src, dir)
    val back = AvroTable.read(spark, dir)
    assert(back.columns.sameElements(src.columns))
    assert(back.schema.fields.map(_.dataType)
      .sameElements(src.schema.fields.map(_.dataType)))
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "Avro round trip changed the data")

    // null cells survive the union(null, T) encoding both ways
    val nullDir = Files.createTempDirectory("graft_avro_null").resolve("t").toString
    val withNulls = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (3L, "c"))
      .toDF("id", "v")
    AvroTable.write(withNulls, nullDir)
    val nb = AvroTable.read(spark, nullDir)
    assert(nb.count() == 3 && nb.filter(col("v").isNull).count() == 1)

    // corrupt container file: zero rows from that file, no dead stage
    val fs = new org.apache.hadoop.fs.Path(nullDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$nullDir/part-99.avro"), true)
    out.write(Array[Byte](1, 2, 3, 4)); out.close()
    assert(AvroTable.read(spark, nullDir).count() == 3,
      "corrupt avro file changed the readable row set")
    // …including one that sorts FIRST (the schema-extraction path must
    // skip it, not die on it)
    val out2 = fs.create(new org.apache.hadoop.fs.Path(s"$nullDir/part-!.avro"), true)
    out2.write(Array[Byte](9, 8, 7)); out2.close()
    assert(AvroTable.read(spark, nullDir).count() == 3,
      "corrupt first-sorting avro file killed the read")

    // an uncommitted dir (no marker) must refuse, not serve partial data
    val bad = Files.createTempDirectory("graft_avro_bad").resolve("t").toString
    fs.mkdirs(new org.apache.hadoop.fs.Path(bad))
    intercept[IllegalArgumentException] { AvroTable.read(spark, bad) }

    // a legitimately EMPTY committed table (fully-filtered frame, zero
    // part files) round-trips: schema from the committed
    // _AVRO_SCHEMA.json, zero rows — not an exception (r10 advice)
    val emptyDir = Files.createTempDirectory("graft_avro_empty").resolve("t").toString
    AvroTable.write(withNulls.filter(col("id") < 0), emptyDir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$emptyDir/_AVRO_SCHEMA.json")),
      "empty-table commit did not persist the schema")
    val eb = AvroTable.read(spark, emptyDir)
    assert(eb.count() == 0 &&
      eb.schema.fieldNames.sameElements(Array("id", "v")),
      "empty committed avro table did not round-trip schema-intact")

    // committed writes leave no attempt temp files behind
    assert(fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$nullDir/part-*.avro.tmp-*")).isEmpty,
      "attempt temp files leaked into the committed dir")

    // ARRAY columns: the float embedding vectors round-trip bit-exactly
    val vecDir = Files.createTempDirectory("graft_avro_vec").resolve("v").toString
    val vecs = graft.Tables.embeddings(spark, sf0001)
    AvroTable.write(vecs, vecDir)
    val vb = AvroTable.read(spark, vecDir)
    assert(vb.exceptAll(vecs).isEmpty && vecs.exceptAll(vb).isEmpty,
      "Avro array round trip changed the embedding vectors")
  }
}
