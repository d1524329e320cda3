package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants that need no oracle (SURVEY §5.3.3),
  * property-checked with scalacheck generators over the fixture
  * tables. The scalatestplus bridge isn't on the offline classpath,
  * so generators are sampled directly with fixed seeds (deterministic
  * across runs). */
class PropertiesSpec extends GraftSuite {

  private def forAll[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  test("dedup idempotence: dropDuplicates twice equals once") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val once = li.dropDuplicates("l_orderkey", "l_linenumber", "l_partkey")
    val twice = once.dropDuplicates("l_orderkey", "l_linenumber", "l_partkey")
    assert(once.count() == twice.count())
  }

  test("union cardinality: |A ∪all B| = |A| + |B| for any predicate split") {
    val genPivot = Gen.choose(1000.0, 400000.0)
    forAll(genPivot) { pivot =>
      val o = Tables.orders(spark, sf)
      val a = o.filter(col("o_totalprice") <= pivot)
      val b = o.filter(col("o_totalprice") > pivot)
      assert(a.unionByName(b).count() == o.count())
    }
  }

  test("top-k is a subset of its group and ordered: any k in 1..10") {
    forAll(Gen.choose(1, 10)) { k =>
      val top = Tables.orders(spark, sf)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(k).collect().map(_.getAs[Double]("o_totalprice"))
      assert(top.length == math.min(k, Tables.orders(spark, sf).count()).toInt)
      assert(top.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("sessionize cross-implementation property: lag-based and session_window histograms agree") {
    // Two INDEPENDENT sessionization implementations — the batch
    // lag/running-sum formulation (window_lag_lead_sessionize) and
    // Structured Streaming's session_window (stream_session_window) —
    // must produce the same session-size histogram on the same fixture.
    val lagBased = graft.operators.Windows
      .queries("window_lag_lead_sessionize")(spark, sf)
    val streamBased = graft.streaming.Streaming
      .queries("stream_session_window")(spark, sf)
    assert(lagBased.except(streamBased).isEmpty &&
      streamBased.except(lagBased).isEmpty,
      "lag-based and session_window sessionization disagree")
  }

  test("cosine self-similarity == 1 for generated float vectors") {
    graft.functions.GraftFunctions.register(spark)
    val genVec = Gen.listOfN(8, Gen.choose(-10.0f, 10.0f))
      .suchThat(v => v.exists(_ != 0.0f))
    forAll(genVec) { v =>
      import spark.implicits._
      val c = Seq(Tuple1(v.toArray)).toDF("v")
        .select(expr("cosine_sim(v, v)").as("c")).collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-9)
    }
  }

  test("connected components equal union-find on random graphs") {
    // random sparse graphs (path/star/cycle-ish mixes emerge naturally)
    // exercise the propagation + pointer-jump loop well beyond the
    // fixture graph's shape, including diameter-heavy chains
    import spark.implicits._
    val genGraph = for {
      n <- Gen.choose(5, 60)
      m <- Gen.choose(0, n * 2)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n.toLong, edges.filter(e => e._1 != e._2).distinct)
    forAll(genGraph, n = 6) { case (n, edges) =>
      val verts = spark.range(n).toDF("n")
      val pairs = edges.toDF("a", "b")
      val got = graft.operators.Clustering.components(verts, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side union-find
      val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0L until n).map(i => i -> find(i)).toMap
      assert(got == expected,
        s"n=$n edges=$edges:\n got=$got\n expected=$expected")
    }
  }

  test("text_sequence_pack: packs partition each shard in doc order") {
    val packs = graft.operators.TextPipeline
      .queries("text_sequence_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every doc lands in exactly one pack
    assert(packs.map(_._3).sum == docs.length.toLong)
    // per-shard token totals conserved
    val tokByShard = docs.groupBy(_._1 % 8).view.mapValues(_.map(_._2).sum)
    packs.groupBy(_._1).foreach { case (shard, ps) =>
      assert(ps.map(_._4).sum == tokByShard(shard),
        s"shard $shard lost tokens")
      // doc ranges are disjoint and ordered: pack N+1 starts after N ends
      val ordered = ps.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(p, q) => assert(q._5 > p._6,
          s"shard $shard: pack ${q._2} overlaps ${p._2}")
        case _ => ()
      }
    }
  }

  test("sample_importance_weighted: deterministic, rate tracks length") {
    val q = graft.operators.TextPipeline.queries("sample_importance_weighted")
    val a = q(spark, sf).collect().toSeq
    val b = q(spark, sf).collect().toSeq
    assert(a == b, "content-hash sampling must be rerun-identical")
    val (tot, kept) = (a.map(_.getLong(1)).sum, a.map(_.getLong(2)).sum)
    assert(kept > 0 && kept < tot, s"degenerate keep rate: $kept/$tot")
    // longer docs must be kept at a higher rate than shorter ones
    val docs = Tables.documents(spark, sf)
      .withColumn("kept",
        substring(md5(col("text")), 1, 6) <
          lpad(lower(hex(floor(least(lit(1.0), length(col("text")) / 4000.0)
            * 16777215.0).cast("long"))), 6, "0"))
      .select(col("n_chars").cast("long"), col("kept")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val median = docs.map(_._1).sorted.apply(docs.length / 2)
    def rate(xs: Array[(Long, Boolean)]) =
      xs.count(_._2).toDouble / math.max(1, xs.length)
    assert(rate(docs.filter(_._1 >= median)) > rate(docs.filter(_._1 < median)),
      "importance weighting must favor longer documents")
  }

  test("multimodal_phash: exactly matches a driver-side aHash mirror; " +
      "every candidate pair shares an identical 16-bit band") {
    val out = graft.operators.TextPipeline.queries("multimodal_phash")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 64)
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver-side aHash: 64 stride-sampled codes, mean-threshold bits
    def hash(t: String): Array[Boolean] = {
      val g = (0 to 63).map(p => t.charAt(p * (t.length - 1) / 63).toLong)
      val tot = g.sum
      g.map(_ * 64 > tot).toArray
    }
    val codes = docs.view.mapValues(hash).toMap
    def ham(a: Long, b: Long): Long =
      codes(a).zip(codes(b)).count { case (x, y) => x != y }.toLong
    def bands(id: Long): Seq[Seq[Boolean]] =
      codes(id).grouped(16).map(_.toSeq).toSeq
    val census = out.filter(_._1 == "census")
    assert(census.length == 1 && census.head._2 == docs.size.toLong)
    val pairs = out.filter(_._1 == "pair")
    assert(pairs.nonEmpty && pairs.length <= 10)
    pairs.foreach { case (_, a, b, h) =>
      assert(h == ham(a, b), s"pair ($a,$b): engine hamming $h != mirror")
      assert(bands(a).zip(bands(b)).exists { case (x, y) => x == y },
        s"pair ($a,$b) shares no identical band — not a banded candidate")
    }
    // the 10 reported pairs are the global closest among ALL banded
    // candidates (mirror the full candidate set, not just the top)
    val cand = (for {
      a <- docs.keys; b <- docs.keys
      if a < b && bands(a).zip(bands(b)).exists { case (x, y) => x == y }
    } yield (ham(a, b), a, b)).toSeq.sorted
    assert(census.head._3 == cand.length.toLong,
      s"candidate census ${census.head._3} != mirror ${cand.length}")
    assert(pairs.sortBy(p => (p._4, p._2, p._3)).map(p => (p._4, p._2, p._3))
      .toSeq == cand.take(pairs.length),
      "reported pairs are not the global closest candidates")
  }
}
