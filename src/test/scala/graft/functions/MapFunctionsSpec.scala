package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Map-typed column surface (SURVEY §1.4: userPlansMap entries are
  * implicit "plan:source" pairs — this is the map-function toolkit a
  * user upgrading that column needs). */
class MapFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("str_to_map parses plan:source entry lists") {
    val df = Seq("MAX XMAS:direct,K+ Intl:promotion").toDF("plans")
    val m = df.select(expr("str_to_map(plans, ',', ':')").as("m"))
    val row = m.select(
      element_at(col("m"), "MAX XMAS").as("a"),
      element_at(col("m"), "K+ Intl").as("b"),
      size(col("m")).as("n")).as[(String, String, Int)].collect().head
    assert(row == (("direct", "promotion", 2)))
  }

  test("map_from_arrays / map_concat / map_keys round-trip") {
    val df = Seq((Seq("a", "b"), Seq(1, 2))).toDF("ks", "vs")
    val out = df.select(
      map_concat(
        map_from_arrays(col("ks"), col("vs")),
        map(lit("c"), lit(3))).as("m"))
      .select(sort_array(map_keys(col("m"))).as("keys"),
              element_at(col("m"), "c").as("c"))
      .as[(Seq[String], Int)].collect().head
    assert(out == ((Seq("a", "b", "c"), 3)))
  }

  test("explode_outer keeps rows with empty/null arrays; explode drops them") {
    val df = Seq(
      (1L, Some(Seq("x", "y"))), (2L, Some(Seq.empty[String])), (3L, None))
      .toDF("id", "arr")
    assert(df.select(col("id"), explode(col("arr"))).count() == 2)
    val outer = df.select(col("id"), explode_outer(col("arr")).as("v"))
    assert(outer.count() == 4) // x, y, null-for-2, null-for-3
    assert(outer.filter(col("v").isNull).select("id").as[Long].collect().toSet == Set(2L, 3L))
  }
}
