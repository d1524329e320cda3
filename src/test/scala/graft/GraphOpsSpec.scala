package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Cross-checks for the fixed-iteration PageRank: mass conservation
  * (no dangling nodes in the symmetric bipartite graph, so total rank
  * stays exactly n through the damped update) and equality with a
  * driver-side recomputation over the same edges. */
class GraphOpsSpec extends GraftSuite {

  private def edgeList(): Array[(Long, Long)] = {
    val pairs = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") % 20 === 0)
      .select((col("l_partkey") * 2).as("pn"),
        (col("l_suppkey") * 2 + 1).as("sn"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.map { case (p, sn) => (p, sn) } ++
      pairs.map { case (p, sn) => (sn, p) }
  }

  private def brutePagerank(edges: Array[(Long, Long)]): Map[Long, Double] = {
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    var pr = deg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double]
      edges.foreach { case (s, t) =>
        contrib(t) = contrib.getOrElse(t, 0.0) + pr(s) / deg(s)
      }
      pr = contrib.map { case (n, c) => n -> (0.15 + 0.85 * c) }.toMap
    }
    pr
  }

  test("graph_pagerank top-20 matches a driver-side recomputation") {
    val brute = brutePagerank(edgeList())
    val expected = brute.toSeq
      .map { case (n, p) => (n, math.floor(p * 10000) / 10000) }
      .sortBy { case (n, p) => (-p, n) }.take(20)
    val got = GraphOps.queries("graph_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // driver sums floats in arbitrary map order vs the engine's exact
    // decimal sums — compare ranks with a 1-ulp-scale slack on the
    // floor-scaled value
    assert(got.map(_._1) == expected.map(_._1),
      s"rank order differs: got=$got expected=$expected")
    got.zip(expected).foreach { case ((_, gp), (_, ep)) =>
      assert(math.abs(gp - ep) <= 1e-4, s"pr drift: $gp vs $ep")
    }
  }

  test("rank mass is conserved (0.15·n teleport + 0.85 damping)") {
    val edges = edgeList()
    val n = edges.map(_._1).distinct.length
    val total = brutePagerank(edges).values.sum
    assert(math.abs(total - n) < 1e-6 * n,
      s"mass leaked: $total vs $n nodes")
  }

  test("graph_kcore: rounds non-increasing and exactly match a " +
    "driver-side reference peel") {
    val got = operators.GraphOps.queries("graph_kcore")(spark, sf)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length == 6)
    got.iterator.sliding(2).withPartial(false).foreach { p =>
      assert(p(1)._1 <= p(0)._1 && p(1)._2 <= p(0)._2,
        "peel must be monotone non-increasing")
    }
    // reference peel over the same co-purchase edge set, in plain
    // Scala collections
    var e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (1 to 6).map { _ =>
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (k, v) => k -> v.length }
      val keep = deg.filter(_._2 >= 8).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
      val nodes = e.flatMap(p => Set(p._1, p._2))
      (nodes.size.toLong, e.size.toLong)
    }
    assert(got.toSeq == expect,
      s"peel profile mismatch: got=${got.toSeq} expect=$expect")
  }

  test("graph_bfs_layers: layer profile matches a driver-side BFS " +
    "and accounts for every node") {
    val got = operators.GraphOps.queries("graph_bfs_layers")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val all = adj.keySet
    val seeds = all.toSeq.sorted.take(3).toSet
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    (1 to 6).foreach { r =>
      val next = frontier.flatMap(adj).diff(dist.keySet)
      dist ++= next.map(_ -> r.toLong)
      frontier = next
    }
    val exp = dist.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong } ++
      (if (all.size > dist.size) Map(-1L -> (all.size - dist.size).toLong)
       else Map.empty[Long, Long])
    assert(got == exp, s"BFS layers $got != mirror $exp")
    assert(got.values.sum == all.size.toLong,
      "every node must be in exactly one layer or unreached")
    assert(got(0L) == 3L, "seed layer must hold the 3 seeds")
  }

  test("graph_community_labelprop: exactly matches a driver-side " +
    "4-round majority-vote mirror") {
    val got = operators.GraphOps.queries("graph_community_labelprop")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.map(_._3).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)), "sizes not ranked descending")
    // mirror in plain collections
    val e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(lab).groupBy(identity)
          .map { case (l, v) => l -> v.length }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val sizes = lab.values.groupBy(identity)
      .map { case (l, v) => (l, v.size.toLong) }.toSeq
    val expTop = sizes.sortBy { case (l, sz) => (-sz, l) }.take(20)
      .zipWithIndex.map { case ((l, sz), i) =>
        (i + 1L, l, sz, sizes.length.toLong) }
    assert(got.toSeq == expTop,
      s"label-prop mismatch: got=${got.take(3).toSeq}… " +
        s"expect=${expTop.take(3)}…")
  }

  test("graph_wcc_components: census exactly matches a driver-side " +
    "union-find over the same graph, singletons included") {
    val got = operators.GraphOps.queries("graph_wcc_components")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    val e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_partkey") % 10 === 0)
      .select("l_partkey").distinct().collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(verts.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    e.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val comp = verts.map(n => n -> find(n)).toMap
    val mem = comp.groupBy(_._2).map { case (r, m) => r -> m.size.toLong }
    val edgeCnt = e.groupBy { case (u, _) => find(u) }
      .map { case (r, es) => r -> es.length.toLong }
    val expect = mem.toSeq.sortBy(_._1).map { case (r, m) =>
      (r, m, edgeCnt.getOrElse(r, 0L)) }
    assert(got == expect,
      s"WCC census mismatch: got=${got.take(3)}… expect=${expect.take(3)}…")
    // the sampled graph has real multi-member components (the fixture
    // has NO isolated sampled parts at test scales — checked — so the
    // singleton path can't be exercised here; it is pinned below)
    assert(expect.exists(_._2 > 1L),
      "co-purchase graph degenerated to all-singletons")
    assert(expect.map(_._2).sum == verts.length.toLong,
      "every vertex must appear in exactly one component")
    // singleton visibility: a vertex with no edges must surface as
    // its own component from the components() machinery
    import org.apache.spark.sql.functions.lit
    val vs = spark.range(3).select(
      org.apache.spark.sql.functions.col("id").as("n"))
    val ps = spark.range(1).select(lit(0L).as("a"), lit(1L).as("b"))
    val lab = graft.operators.Clustering.components(vs, ps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab(2L) == 2L, "isolated vertex must self-label")
    assert(lab(0L) == 0L && lab(1L) == 0L)
  }

  test("graph_modularity: exactly matches a driver-side Newman-Q " +
    "mirror over the labelprop partition") {
    val got = operators.GraphOps.queries("graph_modularity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    // same LP mirror as the labelprop test
    val e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(lab).groupBy(identity)
          .map { case (l, v) => l -> v.length }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = e.length.toLong
    val intra = e.filter { case (u, v) => lab(u) == lab(v) }
      .groupBy { case (u, _) => lab(u) }
      .map { case (c, es) => c -> es.length.toLong }
    val degSum = adj.toSeq.groupBy { case (n, _) => lab(n) }
      .map { case (c, ns) => c -> ns.map(_._2.length.toLong).sum }
    val csize = lab.values.groupBy(identity)
      .map { case (c, v) => c -> v.size.toLong }
    def q6(num: BigInt, den: BigInt): Double =
      math.floor(num.toDouble / den.toDouble * 1e6) / 1e6
    val den = BigInt(m) * m * 4
    val qTotal = q6(csize.keys.map(c =>
      BigInt(intra.getOrElse(c, 0L)) * 4 * m
        - BigInt(degSum(c)) * degSum(c)).sum, den)
    val expect = csize.toSeq.sortBy { case (c, sz) => (-sz, c) }.take(15)
      .zipWithIndex.map { case ((c, sz), i) =>
        val ic = intra.getOrElse(c, 0L); val ds = degSum(c)
        (i + 1L, c, sz, ic, ds,
          q6(BigInt(ic) * 4 * m - BigInt(ds) * ds, den), qTotal)
      }
    assert(got.toSeq == expect,
      s"modularity mismatch: got=${got.take(3).toSeq}… " +
        s"expect=${expect.take(3)}…")
    // Q ∈ [-1/2, 1] (the Newman bounds), and Q == 0 exactly iff ONE
    // community holds every edge (then intra·4m == deg² == 4m²
    // term-for-term) — which is what the sf0.001 fixture's 85-edge
    // graph collapses to; sf0.01's denser graph sits near zero
    // (−0.000268: the dominant community holds almost every edge, so
    // LP's partition barely differs from the null model there)
    assert(qTotal >= -0.5 && qTotal <= 1.0, s"out-of-range Q=$qTotal")
    if (qTotal == 0.0)
      assert(intra.size == 1 && intra.values.sum == m,
        "Q=0 without a single all-edge community — quantization bug")
  }

  test("graph_betweenness_khop: exactly matches a driver-side " +
    "truncated-Brandes replay with integer delta quantiles") {
    val got = operators.GraphOps.queries("graph_betweenness_khop")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got.length <= 15)
    val e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val Q = 1000000L
    val srcs = adj.keys.toSeq.sorted.take(4)
    val bq = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    srcs.foreach { s0 =>
      // forward: layers with path counts
      var layers = Vector(Map(s0 -> 1L))
      var seen = Set(s0)
      (1 to 3).foreach { _ =>
        val next = collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        layers.last.foreach { case (u, su) =>
          adj(u).foreach(v => if (!seen.contains(v)) next(v) += su)
        }
        layers :+= next.toMap
        seen ++= next.keys
      }
      // backward: integer delta quantiles, term = (su*(Q+dqv)) / sv
      var dq: Map[Long, Long] = layers(3).keys.map(_ -> 0L).toMap
      (2 to 1 by -1).foreach { r =>
        val nxt = layers(r + 1)
        dq = layers(r).map { case (u, su) =>
          u -> adj(u).filter(nxt.contains).map(v =>
            su * (Q + dq(v)) / nxt(v)).sum
        }
        dq.foreach { case (n, d) => bq(n) += d }
      }
      layers(3).keys.foreach(n => bq(n) += 0L)
    }
    val want = bq.toSeq.sortBy { case (n, b) => (-b, n) }.take(15)
      .map { case (n, b) => (n, b.toDouble / 1e6) }
      .sortBy { case (n, b) => (-b, n) }
    assert(got == want,
      s"betweenness mismatch: got=${got.take(3)}… want=${want.take(3)}…")
  }

  test("graph_random_walk_corpus: exactly matches a driver-side " +
    "md5-coin walk replay; walks never leave the edge set") {
    val got = operators.GraphOps.queries("graph_random_walk_corpus")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    val e = operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).distinct }
    def md5hex(s0: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val starts = adj.keys.filter(_ % 7 == 0).toSeq.sorted
    val want = starts.flatMap { s0 =>
      var cur = s0
      (0, s0) +: (1 to 4).map { r =>
        cur = adj(cur).minBy(b =>
          (md5hex(s"$s0:$r:$cur:$b"), b))
        (r, cur)
      }
    }.zip(starts.flatMap(s0 => Seq.fill(5)(s0)))
      .map { case ((st, n), s0) => (s0, st, n) }
      .sortBy(t => (t._1, t._2))
    assert(got == want,
      s"walk mismatch: got=${got.take(6)}… want=${want.take(6)}…")
    // every consecutive pair is a real edge
    got.groupBy(_._1).foreach { case (_, w) =>
      w.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(adj(a._3).contains(b._3),
          s"walk used a non-edge ${a._3}->${b._3}")
        case _ => ()
      }
    }
  }

  test("graph_link_prediction: non-empty, scores in (0,1], candidates " +
    "are distance-2 NON-edges of the co-purchase graph (r15 — the " +
    "co-supply variant was structurally empty at sf0.01)") {
    val rows = GraphOps.queries("graph_link_prediction")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "candidate set must be non-empty at every " +
      "fixture scale — emptiness made the driver hash check vacuous")
    val byOrder = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).toSeq)
    val edges: Set[(Long, Long)] = byOrder
      .flatMap(g => for (a <- g; b <- g if a < b) yield (a, b))
      .toSet
    rows.foreach { r =>
      val (x, y, cn, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(cn >= 1, "a distance-2 pair shares at least one neighbor")
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
      assert(!edges.contains((x, y)),
        s"candidate ($x,$y) is an existing edge — anti-join failed")
    }
  }
}
