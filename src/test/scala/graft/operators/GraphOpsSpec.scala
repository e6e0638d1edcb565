package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphQueries.trianglesFrom]] / [[GraphQueries.linkPredictFrom]] on
  * a handcrafted graph with known counts — the registered queries run
  * the same plans over the persisted kNN artifact, where the oracle
  * re-derives everything; here the expected values are hand-countable.
  *
  * Graph (undirected): a 4-clique {1,2,3,4}, a pendant 5–1, and an
  * isolated edge 6–7.
  *   - Each clique node: deg 3 (node 1: deg 4), tri 3, coeff 100%
  *     (node 1: 3 triangles over C(4,2)=6 wedges = 50%).
  *   - Node 5: deg 1, tri 0, coeff 0 by definition.
  *   - Nodes 6,7: deg 1, tri 0, coeff 0.
  *   - Link prediction: 5 shares neighbor 1 with 2,3,4 → cn 1 each;
  *     no unlinked pair inside the clique; 6–7 are linked. Top pairs
  *     are exactly (2,5),(3,5),(4,5) with cn=1.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def und = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // 4-clique
    (1L, 5L),                                                   // pendant
    (6L, 7L)                                                    // isolated edge
  ).toDF("u", "v")

  test("trianglesFrom counts triangles and clustering coefficient") {
    val got = GraphQueries.trianglesFrom(und)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 3L, 50L),
      (2L, 3L, 3L, 100L),
      (3L, 3L, 3L, 100L),
      (4L, 3L, 3L, 100L),
      (5L, 1L, 0L, 0L),
      (6L, 1L, 0L, 0L),
      (7L, 1L, 0L, 0L)))
  }

  test("linkPredictFrom proposes exactly the unlinked common-neighbor pairs") {
    val got = GraphQueries.linkPredictFrom(und)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 5L, 1L), (3L, 5L, 1L), (4L, 5L, 1L)))
  }

  test("communitiesFrom separates two triangles across a bridge") {
    // Two triangles {1,2,3} and {4,5,6} joined by the bridge 3–4.
    // Hand-traced synchronous min-tiebreak LPA over 3 supersteps:
    //   l1: 1→2 2→1 3→1 4→3 5→4 6→4
    //   l2: 1→1 2→1 3→1 4→4 5→3 6→3
    //   l3: 1→1 2→1 3→1 4→3 5→3 6→3
    // — each triangle converges to its own label; the bridge does not
    // merge them.
    val bridge = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)
    ).toDF("u", "v")
    val got = GraphQueries.communitiesFrom(bridge)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)))
  }

  test("communitiesFrom on an empty edge set returns empty, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(GraphQueries.communitiesFrom(empty).count() == 0)
  }

  test("undirected canonicalizes and dedups a directed edge set") {
    val directed = Seq((2L, 1L), (1L, 2L), (3L, 9L)).toDF("vec_a", "vec_b")
    val got = GraphQueries.undirected(directed)
      .orderBy("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (3L, 9L)))
  }
}
