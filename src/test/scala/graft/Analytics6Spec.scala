package graft

/** Semantic invariants for the round-10 curation/experimentation
  * operators — the properties the hash oracle can't see.
  */
class Analytics6Spec extends GraftSuite {

  test("sample_time_decay: newest year keeps everything, realized " +
    "keep rate tracks 2^-age within binomial tolerance") {
    val rows = SparkEntry.queries("sample_time_decay")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val byAge = rows.map(r => r.getLong(1) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // age 0 => threshold 2^48 => every u48 < threshold
    assert(byAge(0L)._3 == 1.0, "age-0 year must keep 100%")
    rows.foreach { r =>
      val (age, n, kept, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(kept <= n)
      val expect = math.pow(0.5, age.toDouble)
      // 4-sigma binomial band around the target rate
      val sigma = math.sqrt(expect * (1 - expect) / n.toDouble)
      assert(math.abs(rate - expect) <= 4 * sigma + 1e-4,
        s"age $age: rate $rate vs 2^-age $expect (n=$n)")
      assert(r.getDouble(6) <= r.getDouble(5) + 1e-9,
        s"age $age: kept revenue exceeds raw revenue")
    }
  }

  test("analytics_cuped: both arms cover all customers, adjustment " +
    "preserves the pooled mean and does not inflate variance") {
    val rows = SparkEntry.queries("analytics_cuped")(spark, sf)
      .collect()
    assert(rows.length == 2, "hash split must produce two arms")
    val nTotal = rows.map(_.getLong(1)).sum
    val nCust = Tables.customer(spark, sf).count()
    assert(nTotal == nCust,
      s"units $nTotal != customers $nCust — units were dropped")
    rows.foreach { r =>
      val (vy, vya, vr) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(vy > 0.0 && vya > 0.0)
      // pooled theta minimizes pooled variance; per-arm reduction can
      // wobble but must never materially inflate
      assert(vya <= vy * 1.05,
        s"arm ${r.getLong(0)}: adjusted variance $vya inflates raw $vy")
      assert(vr == math.floor((1.0 - vya / vy) * 10000.0) / 10000.0)
    }
    // CUPED shifts each unit by theta*(x - xbar); pooled over ALL
    // units these shifts sum to ~0, so the POOLED mean is preserved
    val my = rows.map(r => r.getLong(1) * r.getDouble(2)).sum / nTotal
    val ma = rows.map(r => r.getLong(1) * r.getDouble(3)).sum / nTotal
    assert(math.abs(my - ma) <= math.abs(my) * 0.001 + 1.0,
      s"pooled mean not preserved: raw $my vs adjusted $ma")
  }

  test("sample_raking_ipf: source marginals exact after the final " +
    "source step, lang marginals converged, weights positive") {
    val rows = SparkEntry.queries("sample_raking_ipf")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lg, sc, n, w, sh) =>
      assert(w > 0.0, s"($lg,$sc): non-positive weight")
      assert(sh >= 0.0 && sh <= 1.0)
    }
    val nTotal = rows.map(_._3).sum.toDouble
    val nLang = rows.map(_._1).distinct.length
    val nSrc = rows.map(_._2).distinct.length
    val srcTgt = nTotal / nSrc
    val langTgt = nTotal / nLang
    // the LAST IPF step rescaled source marginals => exact (up to the
    // 1e-6 weight quantization accumulated over <=L cells)
    rows.groupBy(_._2).foreach { case (sc, cs) =>
      val m = cs.map(c => c._4 * c._3).sum
      assert(math.abs(m - srcTgt) <= srcTgt * 0.001,
        s"source $sc: weighted marginal $m vs target $srcTgt")
    }
    // lang marginals were rescaled one half-round earlier: converged
    // but not exact — 5% band after 3 rounds
    rows.groupBy(_._1).foreach { case (lg, cs) =>
      val m = cs.map(c => c._4 * c._3).sum
      assert(math.abs(m - langTgt) <= langTgt * 0.05,
        s"lang $lg: weighted marginal $m vs target $langTgt")
    }
  }

  test("text_bm25_retrieval: ranked top-3 per probe from the right " +
    "universes, scores positive and descending") {
    val rows = SparkEntry.queries("text_bm25_retrieval")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (pid, _, cid, score) =>
      assert(pid % 97 == 0, s"probe $pid not from the probe universe")
      assert(cid % 5 == 0, s"candidate $cid not from the cand universe")
      assert(pid != cid)
      assert(score > 0.0, s"($pid,$cid): non-positive BM25 $score")
    }
    rows.groupBy(_._1).foreach { case (pid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"probe $pid: ranks not contiguous from 1")
      assert(sorted.length <= 3)
      sorted.iterator.sliding(2).withPartial(false).foreach { p =>
        assert(p(0)._4 >= p(1)._4,
          s"probe $pid: scores not descending")
      }
    }
  }

  test("sim_hybrid_retrieval: RRF recomputes exactly from the arm " +
    "ranks, union semantics hold, fused order correct") {
    val rows = SparkEntry.queries("sim_hybrid_retrieval")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    var bothArms = 0
    rows.foreach { r =>
      val rb = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val rc = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(rb.nonEmpty || rc.nonEmpty,
        "fused row carries neither arm rank")
      rb.foreach(v => assert(v >= 1 && v <= 10))
      rc.foreach(v => assert(v >= 1 && v <= 10))
      if (rb.nonEmpty && rc.nonEmpty) bothArms += 1
      val expect = math.floor(
        (rb.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)
          + rc.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)) * 1e6) / 1e6
      assert(r.getDouble(5) == expect,
        s"(${r.getLong(0)},${r.getLong(2)}): rrf ${r.getDouble(5)} " +
          s"!= recomputed $expect from rb=$rb rc=$rc")
    }
    assert(bothArms > 0,
      "no candidate was found by BOTH arms — fusion never fused")
    rows.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ==
        (1L to sorted.length).toSeq)
      sorted.iterator.sliding(2).withPartial(false).foreach { p =>
        assert(p(0).getDouble(5) >= p(1).getDouble(5),
          s"probe $pid: fused scores not descending")
      }
    }
  }

  test("analytics_diff_in_diff: arms cover all customers, DiD equals " +
    "the trend difference, internal arithmetic consistent") {
    val rows = SparkEntry.queries("analytics_diff_in_diff")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nT, nC) = (r.getLong(0), r.getLong(1))
    assert(nT + nC == Tables.customer(spark, sf).count())
    assert(nT > 0 && nC > 0)
    val (preT, preC, postT, postC) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val (trT, trC, did) =
      (r.getDouble(6), r.getDouble(7), r.getDouble(8))
    assert(trT == math.floor((postT - preT) * 10000.0) / 10000.0)
    assert(trC == math.floor((postC - preC) * 10000.0) / 10000.0)
    assert(did == math.floor((trT - trC) * 10000.0) / 10000.0)
    Seq(preT, preC, postT, postC).foreach(v => assert(v > 0.0))
  }

  test("analytics_attribution_shapley: efficiency axiom exact in " +
    "24ths, values match a driver-side brute-force Shapley") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("analytics_attribution_shapley")(
      spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet ==
      Set("click", "error", "signup", "view"))
    // journey masks recomputed independently
    val ev = Tables.events(spark, sf)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("pts"))
    val masks = ev.join(fp, Seq("user_id"))
      .filter(col("ts") < col("pts") && col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().groupBy(_.getLong(0))
      .map { case (_, rs) =>
        rs.map(_.getString(1) match {
          case "click" => 1; case "error" => 2
          case "signup" => 4; case "view" => 8; case _ => 0
        }).sum
      }.toSeq
    val nUsers = fp.count().toInt
    val allMasks = masks ++ Seq.fill(nUsers - masks.length)(0)
    def v(s: Int): Long = allMasks.count(m => (m & s) == m).toLong
    val w24 = Array(6, 2, 2, 6)
    val expect = Seq("click" -> 1, "error" -> 2, "signup" -> 4,
      "view" -> 8).map { case (name, cb) =>
      val phi = (0 until 16).filter(s => (s & cb) == 0).map { s =>
        w24(Integer.bitCount(s)) * (v(s | cb) - v(s))
      }.sum
      name -> phi
    }.toMap
    assert(got == expect,
      s"Shapley mismatch: got=$got expect=$expect")
    // efficiency: Σφ·24 = 24·(v(C) − v(∅)) = 24·(explained journeys)
    val explained = allMasks.count(_ != 0).toLong
    assert(got.values.sum == 24L * explained,
      s"efficiency axiom violated: ${got.values.sum} != 24*$explained")
  }

  test("sample_pps_systematic: exactly 100 boundary crossings, " +
    "census matches a driver-side cumulative walk") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("sample_pps_systematic")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    assert(got.map(_._3).sum == 100L,
      s"crossings must sum to exactly n=100, got ${got.map(_._3).sum}")
    // naive driver-side mirror of the two-pass distributed cumsum
    val units = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val total = units.map(_._2).sum
    var csum = 0L
    val expect = units.flatMap { case (k, c) =>
      val prev = csum; csum += c
      val cross = (csum * 100) / total - (prev * 100) / total
      if (cross > 0) Some((k, c, cross)) else None
    }.toSeq
    assert(got == expect,
      s"PPS selection diverges from the naive walk: got ${got.take(3)}… " +
        s"expect ${expect.take(3)}…")
    // size-proportionality sanity: the selected mass share must
    // exceed the selected unit-count share (whales over-selected)
    val selMass = got.map(_._2).sum.toDouble / total
    assert(selMass > got.length.toDouble / units.length,
      "PPS did not weight selection toward large units")
  }

  test("graph_local_clustering: bucket census matches a driver-side " +
    "per-node triangle/degree mirror") {
    val got = SparkEntry.queries("graph_local_clustering")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty)
    val e = graft.operators.GraphOps.coPurchaseEdges(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val eset = e.toSet
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map { case (n, v) => n -> v.length }
    val triCnt = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- e; (b2, c) <- e if b2 == b && eset((a, c))) {
      triCnt(a) += 1; triCnt(b) += 1; triCnt(c) += 1
    }
    val expect = deg.toSeq.filter(_._2 >= 2).map { case (n, d) =>
      val lcc = math.floor(2.0 * triCnt(n) / (d.toLong * (d - 1))
        * 10000.0) / 10000.0
      (math.min(math.floor(lcc * 10).toLong, 9L), lcc)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (bk, vs) =>
      val mean = math.floor(
        vs.map(v => BigDecimal(v._2)).sum.toDouble / vs.length
          * 10000.0) / 10000.0
      (bk, vs.length.toLong, mean)
    }
    assert(got == expect,
      s"lcc census mismatch: got=$got expect=$expect")
  }

  test("window_pattern_vshape: census matches a driver-side mirror " +
    "of the quantized daily series") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("window_pattern_vshape")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val daily = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        to_date(col("o_orderdate")).as("day"))
      .agg((floor(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double")
        / count(lit(1)).cast("double") * 10000.0)).cast("long")
        .as("v4"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (seg, rs) =>
      val vs = rs.sortBy(_._2.getTime).map(_._3)
      var nv = 0L; var maxd = 0L
      for (i <- 1 until vs.length - 1) {
        if (vs(i - 1) * 100 >= vs(i) * 105 &&
            vs(i + 1) * 100 >= vs(i) * 105) {
          nv += 1
          maxd = math.max(maxd, math.min(vs(i - 1), vs(i + 1)) - vs(i))
        }
      }
      seg -> ((vs.length.toLong, nv, maxd))
    }
    assert(got == expect,
      s"v-shape census mismatch: got=$got expect=$expect")
    assert(expect.values.exists(_._2 > 0L),
      "fixture series produced zero V-shapes — threshold too strict " +
        "to exercise the pattern")
  }

  test("timeseries_sax_words: word census matches a driver-side " +
    "BigInt symbolization, shares sum to ~1 per segment, all four " +
    "symbols appear") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("timeseries_sax_words")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // driver-side mirror: same quantized daily series, exact BigInt
    // breakpoint test L²·10⁸ ≷ 6745²·(n·Σv²−(Σv)²)
    val daily = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        to_date(col("o_orderdate")).as("day"))
      .agg((floor(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double")
        / count(lit(1)).cast("double") * 10000.0)).cast("long")
        .as("v4"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (seg, rs) =>
      val vs = rs.sortBy(_._2.getTime).map(_._3).map(BigInt(_))
      val n = BigInt(vs.length); val sv = vs.sum
      val sq = vs.map(v => v * v).sum
      val dd = n * sq - sv * sv
      val syms = vs.map { v =>
        val l = n * v - sv
        val hot = l * l * 100000000L > BigInt(45495025L) * dd
        if (l < 0) { if (hot) "a" else "b" }
        else { if (l > 0 && hot) "d" else "c" }
      }
      syms.sliding(3).filter(_.length == 3)
        .map(w => (seg, w.mkString)).toSeq
    }.groupBy(identity).map { case (k, ws) => k -> ws.length.toLong }
    assert(got == expect,
      s"SAX census mismatch: got=${got.toSeq.sorted.take(8)}... " +
        s"expect=${expect.toSeq.sorted.take(8)}...")
    // symbol coverage: the quartile breakpoints must actually split
    // the fixture series (all 4 letters observed somewhere)
    val letters = got.keys.flatMap(_._2.toSeq).toSet
    assert(letters == Set('a', 'b', 'c', 'd'),
      s"alphabet not fully exercised: $letters")
    // shares are n/total quantized — per segment they sum to ≤1 and
    // within 64·10⁻⁴ of 1 (floor loss bound)
    val rows = SparkEntry.queries("timeseries_sax_words")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (seg, ss) =>
      val tot = ss.map(_._2).sum
      assert(tot <= 1.0 + 1e-9 && tot >= 1.0 - ss.length * 1e-4,
        s"segment $seg share mass $tot outside floor-loss band")
    }
  }

  test("text_keyword_rake: top-20 matches a driver-side integer RAKE, " +
    "no stopwords leak into phrases, top-k plans as " +
    "TakeOrderedAndProject") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("text_keyword_rake")(spark, sf)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length == 20)
    got.foreach { case (phrase, nw, _, _) =>
      val ws = phrase.split(" ")
      assert(ws.length == nw.toInt)
      assert(!ws.exists(w => w == "a" || w == "the"),
        s"stopword leaked into phrase '$phrase'")
    }
    assert(got.sliding(2).forall(p => p(0)._4 >= p(1)._4),
      "scores not descending")
    // driver-side mirror with pure integer arithmetic
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val stop = Set("a", "the")
    val phrases = docs.flatMap { case (_, text) =>
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      text.split(" ", -1).foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) out += cur.toSeq; cur.clear() }
        else if (w.nonEmpty) cur += w
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    val freq = scala.collection.mutable.Map[String, Long]()
    val deg = scala.collection.mutable.Map[String, Long]()
    phrases.foreach { p =>
      p.foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1
        deg(w) = deg.getOrElse(w, 0L) + p.length
      }
    }
    val wscore = freq.keys.map(w => w -> deg(w) * 10000L / freq(w)).toMap
    val expect = phrases
      .groupBy(p => p.mkString(" "))
      .map { case (ptxt, ps) =>
        (ptxt, ps.head.length.toLong, ps.length.toLong,
          ps.head.map(wscore).sum)
      }
      .toSeq
      .sortBy { case (ptxt, _, _, s4) => (-s4, ptxt) }
      .take(20)
    assert(got.toSeq == expect,
      s"RAKE mismatch:\n got=${got.take(5).toSeq}\n exp=${expect.take(5)}")
    // top-k must never be a single-reducer global sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 should plan as TakeOrderedAndProject")
    // r12 shave (VERDICT r10 #5): phrase length is a (doc_id, pid)
    // window riding the doc_id hash partitioning of the stop-count
    // window, not a groupBy+join-back — the executed plan must show
    // the reuse (ReusedExchange of the doc_id exchange) and carry at
    // most 3 shuffle exchanges total: doc_id (windows), w (word
    // stats), phrase (dedup). Final plan only — the AQE echo of the
    // initial plan would double-count.
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      s"(doc_id, pid) window no longer reuses the doc_id exchange:\n$plan")
    val nShuffles = "\\+- Exchange hashpartitioning".r
      .findAllIn(finalPlan).length
    assert(nShuffles <= 3,
      s"RAKE plan regressed to $nShuffles shuffle exchanges:\n$plan")
  }

  test("window_pattern_kstep: reach counts match a driver-side replay " +
    "of the carry chain and attrit monotonically") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("window_pattern_kstep")(spark, sf)
      .collect().head
    val got = (0 to 4).map(row.getLong)
    // monotone attrition: each step reaches a subset of the previous
    assert(got(1) <= got(0) && got(2) <= got(1)
      && got(3) <= got(2) && got(4) <= got(3), s"not monotone: $got")
    // driver-side one-pass NFA replay (the declared steps verbatim)
    val steps = Seq[(String, Option[Long])](
      "signup" -> None,
      "view" -> Some(12L * 3600 * 1000000),
      "click" -> Some(8L * 3600 * 1000000),
      "purchase" -> Some(8L * 3600 * 1000000))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val reach = Array.fill(steps.size)(0)
    val users = ev.groupBy(_._1)
    users.foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val st = Array.fill[Option[Long]](steps.size)(None)
      ordered.foreach { case (_, _, t, us) =>
        steps.zipWithIndex.foreach { case ((typ, dl), i) =>
          val ok = t == typ && (dl match {
            case None => true
            case Some(w) => st(i - 1).exists(p => us - p <= w)
          })
          if (ok) st(i) = Some(st(i).fold(us)(math.max(_, us)))
        }
      }
      steps.indices.foreach(i => if (st(i).isDefined) reach(i) += 1)
    }
    assert(got(0) == users.size.toLong, "n_users mismatch")
    steps.indices.foreach(i =>
      assert(got(i + 1) == reach(i).toLong,
        s"step $i: declared ${got(i + 1)} vs replay ${reach(i)}"))
  }

  test("analytics_sprt_group_sequential: exactly matches a driver-side " +
    "walk replay; the decision IS the first ±25 crossing") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("analytics_sprt_group_sequential")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 8)
    val ev = Tables.events(spark, sf)
      .filter(col("event_type") =!= "error")
      .select((col("user_id") % 8).as("arm"), to_date(col("ts")).as("look"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
    val K = 25L
    got.foreach { case (arm, nEv, nLooks, decAt, dec, walkAt, finW) =>
      val mine = ev.filter(_._1 == arm)
      assert(nEv == mine.length.toLong, s"arm $arm event count")
      val byLook = mine.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, es) =>
          es.count(e => Set("purchase", "click")(e._3)).toLong * 2 -
            es.length }
      assert(nLooks == byLook.length.toLong, s"arm $arm look count")
      val walk = byLook.scanLeft(0L)(_ + _).tail
      assert(finW == walk.last, s"arm $arm final walk")
      val firstHit = walk.indexWhere(w => math.abs(w) >= K)
      if (firstHit < 0) {
        assert(decAt == -1L && dec == "continue" && walkAt == walk.last,
          s"arm $arm: no crossing but decided ($decAt, $dec)")
      } else {
        assert(decAt == firstHit + 1L, s"arm $arm decision look")
        assert(walkAt == walk(firstHit), s"arm $arm decision walk")
        assert(dec == (if (walk(firstHit) >= K) "accept_h1"
                       else "accept_h0"), s"arm $arm direction")
        // sequential contract: no EARLIER look had crossed
        assert(walk.take(firstHit).forall(w => math.abs(w) < K),
          s"arm $arm: crossing before the declared decision")
      }
    }
  }
}
