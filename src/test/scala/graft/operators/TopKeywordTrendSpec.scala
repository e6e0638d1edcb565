package graft.operators

import graft.SparkSpec

/** SURVEY §5.1: W1 tie-break determinism; C6/C7 NULL asymmetry. */
class TopKeywordTrendSpec extends SparkSpec {
  import spark.implicits._

  test("top keyword picks max count with alphabetical tie-break, deterministically") {
    val logs = Seq(
      ("u1", "zebra"), ("u1", "zebra"), ("u1", "apple"), ("u1", "apple"),
      ("u2", "solo")).toDF("user_id", "keyword")
    (1 to 3).foreach { _ =>
      val out = TopKeyword(logs).as[(String, String)].collect().toMap
      assert(out == Map("u1" -> "apple", "u2" -> "solo")) // tie 2-2 → alphabetical
    }
  }

  test("trend 3VL asymmetry: NULL category ⇒ Changed but Category_Change Unchanged") {
    val june = Seq(("u1", "kw6", Option("Drama")), ("u2", "kw6", None))
      .toDF("user_id", "most_search_T6", "category_T6")
    val july = Seq(("u1", "kw7", Option("Drama")), ("u2", "kw7", Option("News")))
      .toDF("user_id", "most_search_T7", "category_T7")
    val out = Trend(june, july)
      .select("user_id", "Trending_Type", "Category_Change")
      .as[(String, String, String)].collect()
      .map { case (u, tt, cc) => u -> ((tt, cc)) }.toMap
    assert(out("u1") == ("Unchanged", "Unchanged"))
    // NULL = NULL is NULL ⇒ otherwise("Changed"); NULL <> NULL is NULL ⇒ otherwise("Unchanged")
    assert(out("u2") == ("Changed", "Unchanged"))
  }

  test("trend join keeps USING semantics: one user_id column, inner join") {
    val june = Seq(("u1", "a", "Drama")).toDF("user_id", "most_search_T6", "category_T6")
    val july = Seq(("u2", "b", "Drama")).toDF("user_id", "most_search_T7", "category_T7")
    val out = Trend(june, july)
    assert(out.columns.count(_ == "user_id") == 1)
    assert(out.count() == 0) // inner: disjoint users drop
  }
}
