package graft.ext

import java.sql.Timestamp

import graft.SparkSpec

/** Planted-fixture tests for the co-engagement triangle family: the
  * degree-ordered enumerator against hand-countable graphs, and the
  * bucket cap that keeps pair generation linear under a degenerate
  * bucket. */
class GraphOpsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("u_a", "u_b")
  }

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("K4 has exactly its four triangles, emitted as sorted triples") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(triples(GraphOps.triangleEnum(k4)) ===
      Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("a path and a star are triangle-free") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(GraphOps.triangleEnum(path).count() === 0)
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(GraphOps.triangleEnum(star).count() === 0)
  }

  test("hub with one closing edge yields exactly one triangle (no double count)") {
    // hub 1 has max degree; orientation must still count {1,2,3} once
    val hub = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (2L, 3L))
    assert(triples(GraphOps.triangleEnum(hub)) === Seq((1L, 2L, 3L)))
  }

  /** events-shaped fixture: (user_id, event_type, hour-offset). */
  private def eventsDf(rows: Seq[(Long, String, Int)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, et, h), i) =>
      (i.toLong, u, et, Timestamp.valueOf(f"2026-01-01 ${h}%02d:30:00"))
    }.toDF("event_id", "user_id", "event_type", "ts")
  }

  test("co-engagement edges need CoocMinShared shared buckets") {
    // users 1,2 share 3 buckets -> edge; user 3 shares only 2 -> none
    val ev = eventsDf(Seq(
      (1L, "a", 0), (2L, "a", 0),
      (1L, "a", 1), (2L, "a", 1), (3L, "a", 1),
      (1L, "b", 2), (2L, "b", 2), (3L, "b", 2),
      // duplicate occurrence in an already-counted bucket adds nothing
      (1L, "a", 0)))
    val e = GraphOps.coocEdgesFrom(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(e === Seq((1L, 2L)))
  }

  test("a bucket above CoocBucketCap contributes no pairs") {
    // 1+CoocBucketCap users swarm one bucket; users 1,2 also share three
    // small buckets -> only the (1,2) edge survives, the swarm is dropped
    val swarm = (1L to (GraphOps.CoocBucketCap + 1L)).map(u => (u, "hot", 9))
    val quiet = Seq(
      (1L, "a", 0), (2L, "a", 0), (1L, "a", 1), (2L, "a", 1),
      (1L, "b", 2), (2L, "b", 2))
    val e = GraphOps.coocEdgesFrom(eventsDf(swarm ++ quiet)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(e === Seq((1L, 2L)))
  }

  test("clustering coefficient: exact on K4-with-tail") {
    import spark.implicits._
    // K4 on 1..4 plus pendant 5 hanging off 4: nodes 1-3 have deg 3 and
    // sit in 3 of their 3 possible neighbor pairs' triangles
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val tri = GraphOps.triangleEnum(e)
    val triPerNode = tri.select($"u_a".as("u"))
      .unionAll(tri.select($"u_b".as("u")))
      .unionAll(tri.select($"u_c".as("u")))
      .groupBy($"u").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(triPerNode === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // full coefficient query shape on the planted edges: replicate the
    // join arithmetic nodes 1..3: 2*3/(3*2)=1.0; node 4: 2*3/(4*3)=0.5;
    // node 5: deg 1 -> 0.0
    val deg = e.select($"u_a".as("u")).unionAll(e.select($"u_b".as("u")))
      .groupBy($"u").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
  }

  test("clustering coefficient on harness data: bounded in [0,1], zero for deg<2") {
    val rows = GraphOps.clusteringCoeff(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, nTri, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(c >= 0.0 && c <= 1.0, s"coeff out of range: $c")
      if (deg < 2) assert(c === 0.0)
      else assert(math.abs(c - 2.0 * nTri / (deg * (deg - 1.0))) < 1e-15)
    }
  }

  test("k-core: clique survives, sub-k tail nodes peel; clique degree recovers") {
    // K5 on 1..5 (deg 4 within) + chain 5-6-7: 6 and 7 are already
    // below k and peel together; node 5 falls back to exactly 4
    val k5 = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
    val e = edges(k5 ++ Seq((5L, 6L), (6L, 7L)): _*)
    val got = GraphOps.kcoreFrom(e, k = 4, maxRounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === (1L to 5L).map(u => (u, 4L)))
  }

  test("k-core cascade: tail removal propagates node by node into the core") {
    // lollipop: triangle {1,2,3} + path 3-4-5-6 at k=2. Nodes 4 and 5
    // START at degree 2 (>= k) — only removing 6 drops 5 under k, and
    // only removing 5 drops 4: a genuine multi-round cascade ending at
    // the triangle
    val lolli = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = GraphOps.kcoreFrom(lolli, k = 2, maxRounds = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // the cascade needs 3 removal rounds + 1 confirming round: a bound
    // of 3 must fail loudly, never return a truncated "core"
    val ex = intercept[IllegalArgumentException] {
      GraphOps.kcoreFrom(lolli, k = 2, maxRounds = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("k-core: a path fully unravels even though interior degrees start at k") {
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(GraphOps.kcoreFrom(path, k = 2, maxRounds = 8).count() === 0)
  }

  test("k-core on harness data: rounds reach fixpoint (more rounds change nothing)") {
    val e = GraphOps.coocEdges(spark, "/root/testdata/sf0.001")
    val base = GraphOps.kcoreFrom(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val more = GraphOps.kcoreFrom(e, maxRounds = GraphOps.KcoreRounds + 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base === more)
    base.foreach { case (_, d) => assert(d >= GraphOps.KcoreK) }
  }

  test("harness graph: triangles are closed wedges of real co-engagement edges") {
    val tri = GraphOps.triangles(spark, "/root/testdata/sf0.001")
    val got = triples(tri)
    // every emitted triple must be three pairwise edges of the edge list
    val e = GraphOps.coocEdgesFrom(
        graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (a, b, c) =>
      assert(a < b && b < c)
      assert(e((a, b)) && e((a, c)) && e((b, c)), s"($a,$b,$c) not a triangle")
    }
  }
}
