package graft.sources

import java.nio.file.Files
import graft.SparkSpec

/** Real JDBC round-trip through the sink (embedded Derby stands in for
  * the reference's MySQL warehouse — same DataFrameWriter JDBC path). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  test("JdbcSink overwrites a warehouse table and the data survives a read-back") {
    val dbDir = Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val sink = JdbcSink(url, user = "", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", truncate = false)

    val rows = Seq(("C1", 10L, "High"), ("C2", 3L, "Low"))
      .toDF("Contract", "Active", "Level_Activeness")
    sink.write(rows, "interaction_data")

    // overwrite semantics: second write replaces, not appends
    val rows2 = Seq(("C3", 7L, "Medium")).toDF("Contract", "Active", "Level_Activeness")
    sink.write(rows2, "interaction_data")

    val back = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "interaction_data")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
    assert(back.count() == 1)
    val r = back.collect().head
    assert(r.getAs[String]("Contract") == "C3" && r.getAs[Long]("Active") == 7L)
  }

  private def readBack(url: String, table: String) =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()

  test("truncate mode replaces rows but keeps the target table's DDL") {
    val dbDir = Files.createTempDirectory("graft_derby_tr").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    // the warehouse DBA's table: wider VARCHAR + an index — exactly the
    // DDL truncate-mode overwrite must NOT destroy (the reason the sink
    // defaults truncate=true against the reference's drop+recreate)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE behavior (Contract VARCHAR(200), " +
        "MostWatch VARCHAR(200), Taste VARCHAR(200))")
      st.execute("CREATE INDEX behavior_contract_idx ON behavior (Contract)")
      st.execute("INSERT INTO behavior VALUES ('OLD', 'x', 'y')")
      st.close()
    } finally conn.close()
    val sink = JdbcSink(url, user = "", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", truncate = true)
    val rows = Seq(("C1", "TV", "TV-Movie"), ("C2", "Movie", "Movie"))
      .toDF("Contract", "MostWatch", "Taste")
    sink.write(rows, "behavior")
    // rows replaced...
    val got = readBack(url, "behavior")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set(("C1", "TV", "TV-Movie"), ("C2", "Movie", "Movie")))
    // ...and the DBA's index SURVIVED (a drop+recreate overwrite loses it)
    val conn2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn2.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES WHERE " +
          "CONGLOMERATENAME = 'BEHAVIOR_CONTRACT_IDX'")
      rs.next()
      assert(rs.getInt(1) == 1, "truncate-mode overwrite dropped the index")
    } finally conn2.close()
  }

  test("partition-parallel write round-trips the exact frame") {
    val dbDir = Files.createTempDirectory("graft_derby_par").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val sink = JdbcSink(url, user = "", password = "",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", truncate = false)
    // 4 concurrent JDBC writers (one per partition) — the shape a real
    // warehouse load uses; Derby embedded serializes them internally
    val rows = (1L to 200L).map(i => (s"C$i", i, s"L${i % 5}"))
      .toDF("Contract", "Active", "Level_Activeness")
      .repartition(4)
    sink.write(rows, "parallel_load")
    val got = readBack(url, "parallel_load")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val want = (1L to 200L).map(i => (s"C$i", i, s"L${i % 5}")).toSet
    assert(got == want, "partition-parallel JDBC write lost or mangled rows")
  }
}
