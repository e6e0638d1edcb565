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
}
