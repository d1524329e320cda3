package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity3

/** Property tests for the graph-ANN family (r12) — the build
  * contract (bounded out-degree), the search contract (beam shape,
  * no self-match), the §7.4 recall gate, and determinism. Both keys
  * are ALSO oracle-checked end-to-end (the DuckDB CTE program replays
  * build + search digit-for-digit), so these assert the properties
  * the hash compare can't state: the out-degree BOUND as a contract,
  * and the recall target as a quality gate. */
class Similarity3Spec extends GraftSuite {

  test("sim_graph_ann: 3 hits per query, no self-match, cos in [-1,1], " +
    "ranked descending") {
    val rows = Similarity3.queries("sim_graph_ann")(spark, sf).collect()
    assert(rows.length == 15) // 5 query vectors × top-3
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
      val cs = byRank.map(_.getDouble(3))
      assert(cs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      rs.foreach { r =>
        assert(r.getLong(0) != r.getLong(2), "self-match leaked")
        assert(math.abs(r.getDouble(3)) <= 1.0)
      }
    }
  }

  test("graphEdges: out-degree is exactly M=14 for every node, " +
    "no self-loops, endpoints are real vec_ids") {
    val edges = Similarity3.graphEdges(spark, sf).cache()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    assert(edges.filter(col("a") === col("b")).count() == 0)
    val degs = edges.groupBy("a").agg(count(lit(1)).as("deg"))
      .select("deg").distinct().collect().map(_.getLong(0)).toSet
    // every block has ≥ 24 seed candidates ≥ M, so the bound is tight
    assert(degs == Set(14L), s"out-degrees seen: $degs")
    assert(edges.select("a").distinct().count() == nVecs,
      "every node must carry a neighbor list")
    val ids = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id")).distinct()
    assert(edges.join(ids, col("b") === col("vec_id"), "left_anti")
      .count() == 0, "dangling edge endpoint")
    edges.unpersist()
  }

  test("sim_graph_recall_eval: mean recall@10 >= 0.7 (the §7.4 gate " +
    "the LSH family also clears; measured 1.00 at sf0.001/sf0.01, " +
    "0.84 at sf0.1)") {
    val rows = Similarity3.queries("sim_graph_recall_eval")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 10, "truth set must be top-10")
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.7, s"mean recall@10 below gate: $mean")
  }

  test("sim_graph_ann_insert: placements land in the base, quality " +
    "beats the rank-10 truth bar, and the reverse attach rewires " +
    "base lists") {
    val rows = Similarity3.queries("sim_graph_ann_insert")(spark, sf)
      .collect()
    assert(rows.length == 15) // 5 reported arrivals × top-3
    val nv = graft.Tables.embeddings(spark, sf).count()
    val rewired = rows.map(_.getLong(4)).distinct
    assert(rewired.length == 1 && rewired.head > 0,
      s"reverse attach rewired nothing: ${rewired.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(0) >= nv - 50 && r.getLong(0) < nv - 45,
        "report must cover the 5 lowest arrival ids")
      assert(r.getLong(2) < nv - 50, "placement points outside the base")
    }
    // quality: each arrival's top-1 placement must be at least as
    // close as its TRUE 10th-nearest base vector (driver-side truth)
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(_.getInt(1) == 1).foreach { r =>
      val qv = emb(r.getLong(0))
      val t10 = emb.toSeq.filter(_._1 < nv - 50)
        .map { case (_, v) => cos(qv, v) }.sorted.reverse.apply(9)
      assert(r.getDouble(3) >= t10 - 1e-4,
        s"arrival ${r.getLong(0)}: top-1 placement ${r.getDouble(3)} " +
          s"below the rank-10 truth bar $t10")
    }
  }

  test("sim_graph_ann: deterministic across runs (md5 seed blocks, " +
    "rank tiebreaks, fixed rounds)") {
    val a = Similarity3.queries("sim_graph_ann")(spark, sf).collect().toSeq
    val b = Similarity3.queries("sim_graph_ann")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("sim_graph_ann_delete: no tombstoned node is ever returned, " +
    "census matches the tombstone rule, quality beats the survivor " +
    "rank-10 truth bar") {
    val rows = Similarity3.queries("sim_graph_ann_delete")(spark, sf)
      .collect()
    assert(rows.length == 15) // 5 queries × top-3 over the repaired graph
    rows.foreach { r =>
      assert(r.getLong(2) % 37 != 3,
        s"query ${r.getLong(0)} returned tombstoned node ${r.getLong(2)}")
    }
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val nDel = emb.keys.count(_ % 37 == 3).toLong
    assert(rows.map(_.getLong(4)).distinct.toSeq == Seq(nDel),
      "n_deleted census != the % 37 = 3 tombstone rule")
    val nAff = rows.map(_.getLong(5)).distinct
    assert(nAff.length == 1 && nAff.head > 0,
      "repair touched no lists — holes went unrepaired")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(_.getInt(1) == 1).foreach { r =>
      val qv = emb(r.getLong(0))
      val t10 = emb.toSeq
        .filter { case (id, _) => id % 37 != 3 && id != r.getLong(0) }
        .map { case (_, v) => cos(qv, v) }.sorted.reverse.apply(9)
      assert(r.getDouble(3) >= t10 - 1e-4,
        s"query ${r.getLong(0)}: post-delete top-1 ${r.getDouble(3)} " +
          s"below the survivor rank-10 truth bar $t10")
    }
  }
}
