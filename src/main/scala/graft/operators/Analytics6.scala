package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 curation/experimentation operators: recency-decay corpus
  * sampling, CUPED variance reduction, and raking (iterative
  * proportional fitting) to target marginals.
  *
  *   - `sample_time_decay`: exponential recency-weighted sampling —
  *     the freshness dial of corpus mixing (beside
  *     `sample_temperature_mix`'s source dial): keep probability
  *     halves per year of age, so the training mix tracks the present
  *     without discarding history outright. The keep test is the
  *     repo-standard deterministic md5 coin, but the threshold
  *     compare is PURE INTEGER (48-bit hash vs 2^48 >> age) — no
  *     pow(), no libm, bit-exact in both engines by construction.
  *   - `analytics_cuped`: CUPED variance reduction (Deng et al. 2013,
  *     "Improving the Sensitivity of Online Controlled Experiments")
  *     — THE production A/B-test precision technique beside the raw
  *     t-test key: adjust the experiment metric by the pre-period
  *     covariate, Ŷ = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) pooled,
  *     and DECLARE the achieved per-arm variance reduction. Everything
  *     is closed-form moment arithmetic: exact DECIMAL sums → double
  *     ratios on identical bits → per-row adjusted values quantized
  *     DECIMAL(28,10) pre-sum.
  *   - `sample_raking_ipf`: raking / iterative proportional fitting
  *     (Deming & Stephan 1940) of the (lang × source) contingency
  *     table to uniform target marginals — the survey-statistics
  *     reweighting that hits BOTH marginal targets where one-shot
  *     importance weights hit one; 3 unrolled IPF rounds.
  *
  * Scale notes (100 TB):
  *   - time decay is one map-side coin per row + a bounded per-year
  *     aggregate; the horizon is a 1-row broadcast. Deterministic and
  *     MERGEABLE: any shard keeps the same rows under any partitioning.
  *   - CUPED is two corpus passes: per-unit pre/post rollup (one
  *     shuffle on the unit key), then pooled-moment + per-arm
  *     aggregates over unit-grain rows with map-side combine; θ/X̄
  *     ride a 1-row broadcast back. No sort anywhere.
  *   - raking runs ENTIRELY on the L×S cell synopsis after one
  *     partial-aggregated count pass — the IPF rounds touch ≤100 rows
  *     regardless of corpus size (the synopsis is localCheckpoint'ed
  *     once so the 6 half-round self-references stay cheap leaves).
  */
object Analytics6 {
  type Q = (SparkSession, String) => DataFrame

  /** The experimentation unit frame shared by `analytics_cuped` and
    * `analytics_diff_in_diff`: ALL customers (absent periods
    * contribute 0 — no unit-dropping bias), X = spend before
    * 1998-01-01, Y = spend after, arm = first md5 hex digit of the
    * customer key mod 2. One definition so the pair can never
    * silently desynchronize on the cutoff or the arm hash. */
  private def cupedUnits(s: SparkSession, d: String): DataFrame = {
    val per = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("o_orderdate") < lit("1998-01-01"),
            col("o_totalprice").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("xr"),
        sum(when(col("o_orderdate") >= lit("1998-01-01"),
            col("o_totalprice").cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("yr"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("xr"), lit(0).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("x"),
        coalesce(col("yr"), lit(0).cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("y"))
      .withColumn("arm", expr(
        """CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 1),
                     16, 10) AS BIGINT) % 2"""))
  }

  // BM25-scored (pid, cid, bm25) pairs — probe docs (doc_id%97) as
  // bag-of-words queries vs candidate docs (doc_id%5), inverted-index
  // term equi-join after the df≤30% stop cut, idf ln() quantized
  // DECIMAL(28,10) at term grain, per-pair term scores quantized
  // pre-sum, floor·10⁴. Shared by `text_bm25_retrieval` (top-3 rank)
  // and `sim_hybrid_retrieval` (lexical arm).
  // r15 (guide §2.4/§5): the (doc, term, tf) posting synopsis is
  // materialized ONCE per consuming key — cand, probes, dfs, nAvg and
  // the final join are all views over it, and the lazy form re-ran
  // the explode + tf aggregate per reference (9 parquet scans in
  // text_bm25_retrieval's static plan, 25 in sim_hybrid_retrieval's —
  // this is the inverted-index build a production stack materializes
  // anyway). dl derives from tf (Σ tf == token count, same integers),
  // saving the second full explode pass. The consuming keys END-PIN
  // their small ranked results and FREE the synopsis (r15 #5
  // session 4) — see the key bodies.

  /** The lazy (doc_id, w, tf) posting frame — checkpointed by the
    * consuming keys; used raw by the hint-policy audit. */
  private[graft] def bm25Postings(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  /** The pair pipeline over a given posting frame (lazy — the hint
    * census in PlanShapeSpec audits THIS plan, since the declared
    * keys consume the end-pinned checkpoint whose LogicalRDD root
    * hides the authored hints). */
  private[graft] def bm25PairsOn(tf: DataFrame): DataFrame = {
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val cand = tf.filter(col("doc_id") % 5 === 0)
    val nAvg = cand.select("doc_id").distinct()
      .join(dl, Seq("doc_id"))
      .agg(count(lit(1)).as("nc"),
        (sum(col("dl")).cast("double")
          / count(lit(1)).cast("double")).as("avgdl"))
    val dfs = cand.groupBy("w").agg(count(lit(1)).as("df"))
    // Rare-term backstop (r15, VERDICT r14 #1): the df≤30% stop cut
    // alone kept exactly ONE term of this fixture's 31-word vocabulary
    // — and no probe contained it at sf0.01/0.1, so the pair set (and
    // the driver hash check) was empty. The 8 RAREST terms by (df, w)
    // are kept unconditionally: orderBy().limit is a TakeOrdered (no
    // single-partition window), the bottom-by-df terms are precisely
    // the join-safe ones (a rare term's posting list is short by
    // definition), and at a Heaps-law vocabulary the backstop is a
    // no-op — everything it would keep already passes the cut. BM25's
    // +1 idf variant stays positive for any df, so frequent backstop
    // terms score low rather than negative.
    val rare = dfs.orderBy(col("df"), col("w")).limit(8)
    val dfKeep = dfs.crossJoin(broadcast(nAvg))
      .filter(col("df") * 10 <= col("nc") * 3)
      .unionByName(rare.crossJoin(broadcast(nAvg)))
      .dropDuplicates("w")
      .withColumn("idf", expr(
        """CAST(ln(1.0 + (CAST(nc - df AS DOUBLE) + 0.5)
                         / (CAST(df AS DOUBLE) + 0.5))
                AS DECIMAL(28,10))"""))
      .select(col("w"), col("idf"), col("avgdl"))
    val probes = tf.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("pid"), col("w"))
    // Hint policy (r11, VERDICT r10 #1): `probes` is a 1/97 modulo
    // slice of all postings and `dfKeep` is vocab-grain — BOTH grow
    // with the corpus (probes linearly, vocab by Heaps' law), so a
    // forced broadcast of either is a 100 TB scale-killer exactly like
    // the vocab join text_keyword_rake already refuses to broadcast.
    // Only the 1-row `nAvg` synopsis keeps its hint; the term
    // equi-joins below are hint-free — AQE's runtime size check
    // (spark.sql.autoBroadcastJoinThreshold) may still pick a
    // broadcast when the actual build side is small, which is the
    // size-bounded decision a forced hint bypasses. Pinned in
    // PlanShapeSpec ("retrieval probe/vocab joins carry no forced
    // broadcast hints").
    cand
      .join(dfKeep, Seq("w"))
      .join(probes,
        Seq("w")).filter(col("pid") =!= col("doc_id"))
      .join(dl.withColumnRenamed("doc_id", "cid_dl"),
        col("doc_id") === col("cid_dl"))
      .withColumn("term_score", expr(
        """CAST(CAST(idf AS DOUBLE)
                * (CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                AS DECIMAL(28,10))"""))
      .groupBy(col("pid"), col("doc_id").as("cid"))
      .agg((floor(sum(col("term_score")).cast("double") * 10000.0)
        / 10000).as("bm25"))
  }

  /** Cosine-scored (pid, cid, cos) pairs over doc-grain hashing-trick
    * embeddings (D=256, dim = first two md5 hex digits — the
    * pipeline_chunk_embed_e2e embedding at document grain, no
    * chunking), same probe/candidate universes and stop-dim cut as
    * the lexical arm. The embedding arm of `sim_hybrid_retrieval`. */
  // r15: same materialize-the-synopsis-once treatment as the lexical
  // arm — candsAll/probesAll/dimdf are views over one (doc, dim, c)
  // frame instead of re-running the explode+hash+agg; the consuming
  // key end-pins its ranked result and frees the synopsis.

  /** The lazy (doc_id, dim, c) hashed-dim frame — checkpointed by
    * the consuming key; used raw by the hint-policy audit. */
  private[graft] def cosEmbeddings(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(w), 1, 2), 16, 10) AS BIGINT)")
          .as("dim"))
      .groupBy("doc_id", "dim").agg(count(lit(1)).as("c"))

  /** The pair pipeline over a given hashed-dim frame (lazy — see
    * bm25PairsOn for why the audit pins this, not the key). */
  private[graft] def cosPairsOn(emb: DataFrame): DataFrame = {
    val candsAll = emb.filter(col("doc_id") % 5 === 0)
    val probesAll = emb.filter(col("doc_id") % 97 === 0)
    val nc = candsAll.agg(countDistinct(col("doc_id")).as("nc"))
    // same rare-dim backstop as the lexical arm (r15): the 31-word
    // fixture vocabulary hashes to 31 live dims, almost all above the
    // 30% df cut — bottom-8 by (df, dim) keeps the arm non-empty at
    // every scale and is subsumed by the cut at a real vocabulary
    val dimdf = candsAll.groupBy("dim").agg(count(lit(1)).as("df"))
    val keep = dimdf
      .crossJoin(broadcast(nc))
      .filter(col("df") * 10 <= col("nc") * 3)
      .select("dim")
      .unionByName(dimdf.orderBy(col("df"), col("dim")).limit(8)
        .select("dim"))
      .distinct()
    // `keep` is bounded by the D=256 dim universe (two hex digits) at
    // ANY corpus size, so its broadcast hint is a size contract, not a
    // guess. `probes` and the probe-norm table `pn` are probe-grain —
    // corpus-proportional under the %97 slice — so their hints are
    // gone (same r11 policy as the lexical arm): the dim equi-join and
    // the norm joins shuffle unless AQE's size check picks broadcast.
    val probes = probesAll.join(broadcast(keep), Seq("dim"))
      .select(col("doc_id").as("pid"), col("dim"), col("c").as("pc"))
    val cands = candsAll.join(broadcast(keep), Seq("dim"))
    val pn = probes.groupBy(col("pid").as("pnid"))
      .agg(sqrt(sum(col("pc") * col("pc")).cast("double")).as("pn"))
    val cn = cands.groupBy(col("doc_id").as("cnid"))
      .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("cn"))
    cands
      .join(probes, Seq("dim"))
      .filter(col("pid") =!= col("doc_id"))
      .groupBy(col("pid"), col("doc_id").as("cid"))
      .agg(sum(col("pc") * col("c")).as("dot"))
      .join(pn, col("pid") === col("pnid"))
      .join(cn, col("cid") === col("cnid"))
      .select(col("pid"), col("cid"),
        (floor(col("dot").cast("double") / (col("pn") * col("cn"))
          * 10000.0) / 10000).as("cos"))
  }

  val queries: Map[String, Q] = Map(
    // Recency-decay sampling: keep ∝ 2^(−age_years). The integer
    // threshold 2^48 >> age makes the acceptance test exact: age 0
    // keeps everything (u48 < 2^48 always), each extra year halves
    // the kept mass. Declared per order-year: raw vs kept counts,
    // realized keep rate, raw vs effective revenue — the
    // duplication-aware "effective token budget" view of
    // sample_downweight_duplicates, applied to TIME.
    "sample_time_decay" -> ((s, d) => {
      val op = Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("price"),
          year(col("o_orderdate")).as("yr"))
      val hz = op.agg(max(col("yr")).as("hmax"))
      op.crossJoin(broadcast(hz))
        .withColumn("age", (col("hmax") - col("yr")).cast("int"))
        .withColumn("u48", expr(
          """CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 12),
                       16, 10) AS BIGINT)"""))
        .withColumn("keep",
          col("u48") < expr("shiftright(CAST(281474976710656 AS BIGINT), age)"))
        .groupBy("yr", "age")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          (floor(sum(col("price")).cast("double") * 10000.0) / 10000)
            .as("raw_revenue"),
          (floor(sum(when(col("keep"), col("price"))
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
            * 10000.0) / 10000).as("kept_revenue"))
        .withColumn("keep_rate",
          floor(col("n_kept").cast("double")
            / col("n_orders").cast("double") * 10000.0) / 10000)
        .select(col("yr").cast("long").as("yr"),
          col("age").cast("long").as("age"), col("n_orders"),
          col("n_kept"), col("keep_rate"), col("raw_revenue"),
          col("kept_revenue"))
        .orderBy("yr")
    }),

    // CUPED: units = ALL customers (a customer with no orders in a
    // window contributes 0 — dropping them would bias the arms);
    // pre-period X = spend before 1998-01-01, metric Y = spend after;
    // arm = first md5 hex digit of the customer key mod 2 (the
    // deterministic hash split of sample_hash_split). θ and X̄ come
    // from POOLED moments (standard CUPED — the covariate is
    // pre-experiment, so pooling is unbiased), broadcast back as one
    // row. Declared per arm: n, raw/adjusted means, raw/adjusted
    // sample variances, and the variance-reduction ratio — the
    // precision gain a real experimentation platform reports.
    "analytics_cuped" -> ((s, d) => {
      // Pooled-moment accumulation note (r11, ADVICE r10 low): the
      // first/cross moments feeding θ/X̄ now accumulate EXACTLY like
      // the second moments below — integer-quantized k$ terms,
      // floor(·×10⁴) BIGINT per row — because DECIMAL(38,4) sums whose
      // unscaled value passes 2^53 cast to DOUBLE non-bit-identically
      // across engines (the measured 13th-digit var_y drift), and a
      // drifted θ flips per-row floor(yadj·10⁴) near boundaries. With
      // integer sums, every double that derives θ/X̄ comes from
      // identical int64 bits in both engines by construction.
      val units = cupedUnits(s, d)
        .withColumn("xk", col("x").cast("double") / 1000.0)
        .withColumn("ykq", col("y").cast("double") / 1000.0)
      // r12 (ADVICE r11 low): the quantized SECOND/CROSS moment terms
      // are ~1e10–1e11 per row (xk²·10⁴ for multi-million-dollar
      // customers), so a BIGINT sum silently wraps int64 around ~1e8
      // units — below the 100 TB design point. All quantized moment
      // sums therefore accumulate as DECIMAL(38,0) (exact integer, no
      // wrap on either engine; DuckDB sums it as HUGEINT-backed
      // decimal). The final one-row DECIMAL(38,0)→DOUBLE cast of an
      // exact integer is IEEE round-to-nearest on both engines, so
      // every double deriving θ/X̄ still comes from identical bits.
      val pool = units.agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(CAST(floor(xk * 10000.0) AS BIGINT) AS DECIMAL(38,0))")).as("sx4"),
        sum(expr("CAST(CAST(floor(ykq * 10000.0) AS BIGINT) AS DECIMAL(38,0))")).as("sy4"),
        sum(expr("CAST(CAST(floor(xk * xk * 10000.0) AS BIGINT) AS DECIMAL(38,0))")).as("sxx4"),
        sum(expr("CAST(CAST(floor(xk * ykq * 10000.0) AS BIGINT) AS DECIMAL(38,0))")).as("sxy4"))
      val withTheta = units.crossJoin(broadcast(pool))
        // X̄ back in dollars: (Σ⌊xk·10⁴⌋)/10⁴/n k$ × 1000; θ is the
        // cov/var ratio over the same quantized k$ moments (unit-free,
        // so the k$ quantization grain cancels out of its scale)
        .withColumn("xbar",
          col("sx4").cast("double") / 10000.0
            / col("n").cast("double") * 1000.0)
        .withColumn("theta",
          (col("sxy4").cast("double") / 10000.0
            - (col("sx4").cast("double") / 10000.0)
              * (col("sy4").cast("double") / 10000.0)
              / col("n").cast("double"))
          / (col("sxx4").cast("double") / 10000.0
            - (col("sx4").cast("double") / 10000.0)
              * (col("sx4").cast("double") / 10000.0)
              / col("n").cast("double")))
        .withColumn("yadj",
          col("y").cast("double")
            - col("theta") * (col("x").cast("double") - col("xbar")))
      // Variance accumulation note: Σy² as a scale-4 DECIMAL has an
      // unscaled value past 2^53 at fixture scale, and DECIMAL→DOUBLE
      // casts of such sums are NOT bit-identical across engines
      // (measured: the two engines' var_y differed in the 13th digit).
      // So second moments accumulate as INTEGER-quantized terms in
      // k$² units — floor((y/1000)²·10⁴) per row is an exact value —
      // and the sums are widened to DECIMAL(38,0) (r12: per-row terms
      // reach ~1e11, so an int64 sum wraps near ~1e8 units; a scale-0
      // decimal sum is exact at any corpus size and its one-row
      // →DOUBLE cast is bit-stable). Variances are DECLARED in k$²
      // (columns *_k2).
      withTheta
        .withColumn("yk", col("y").cast("double") / 1000.0)
        .withColumn("yak", col("yadj") / 1000.0)
        .groupBy("arm")
        .agg(count(lit(1)).as("n_units"),
          sum(col("y").cast("decimal(38,4)")).as("asy"),
          sum(expr("CAST(CAST(floor(yadj * 10000.0) AS BIGINT) AS DECIMAL(38,0))")).as("sa4"),
          sum(expr("CAST(CAST(floor(yk * yk * 10000.0) AS BIGINT) AS DECIMAL(38,0))"))
            .as("s2y"),
          sum(expr("CAST(CAST(floor(yak * yak * 10000.0) AS BIGINT) AS DECIMAL(38,0))"))
            .as("s2a"))
        .withColumn("nd", col("n_units").cast("double"))
        .withColumn("mean_y",
          floor(col("asy").cast("double") / col("nd") * 10000.0) / 10000)
        .withColumn("mean_y_adj",
          floor(col("sa4").cast("double") / 10000.0 / col("nd")
            * 10000.0) / 10000)
        .withColumn("syk", col("asy").cast("double") / 1000.0)
        .withColumn("sak",
          col("sa4").cast("double") / 10000.0 / 1000.0)
        .withColumn("var_y_k2", floor(
          (col("s2y").cast("double") / 10000.0
            - col("syk") * col("syk") / col("nd"))
          / (col("nd") - 1.0) * 10000.0) / 10000)
        .withColumn("var_y_adj_k2", floor(
          (col("s2a").cast("double") / 10000.0
            - col("sak") * col("sak") / col("nd"))
          / (col("nd") - 1.0) * 10000.0) / 10000)
        .withColumn("var_reduction",
          floor((lit(1.0) - col("var_y_adj_k2") / col("var_y_k2"))
            * 10000.0) / 10000)
        .select(col("arm"), col("n_units"), col("mean_y"),
          col("mean_y_adj"), col("var_y_k2"), col("var_y_adj_k2"),
          col("var_reduction"))
        .orderBy("arm")
    }),

    // Raking / IPF to uniform (lang, source) targets: 3 unrolled
    // rounds, each = one lang-marginal rescale + one source-marginal
    // rescale over the ≤L·S cell synopsis. Per-cell w·n terms are
    // quantized DECIMAL(28,10) before every marginal sum (the repo's
    // order-independence rule), ratios run in double on identical
    // bits. Declared per cell: count, final weight, weighted share.
    "sample_raking_ipf" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tot = cells.agg(
        sum(col("n")).as("nn"),
        countDistinct(col("lang")).as("ll"),
        countDistinct(col("source")).as("ss"))
      var w = cells.crossJoin(broadcast(tot)).withColumn("w", lit(1.0))
      for (_ <- 1 to 3) {
        val lt = w.groupBy(col("lang").as("lg"))
          .agg(sum((col("w") * col("n")).cast("decimal(28,10)"))
            .as("cl"))
        w = w.join(broadcast(lt), col("lang") === col("lg"))
          .withColumn("w", col("w")
            * (col("nn").cast("double") / col("ll").cast("double"))
            / col("cl").cast("double"))
          .drop("lg", "cl")
        val st = w.groupBy(col("source").as("sc"))
          .agg(sum((col("w") * col("n")).cast("decimal(28,10)"))
            .as("cs"))
        w = w.join(broadcast(st), col("source") === col("sc"))
          .withColumn("w", col("w")
            * (col("nn").cast("double") / col("ss").cast("double"))
            / col("cs").cast("double"))
          .drop("sc", "cs")
      }
      w.select(col("lang"), col("source"), col("n").as("n_docs"),
          (floor(col("w") * 1000000.0) / 1000000).as("w_final"),
          (floor(col("w") * col("n").cast("double")
            / col("nn").cast("double") * 1000000.0) / 1000000)
            .as("w_share"))
        .orderBy("lang", "source")
    }),

    // BM25 lexical retrieval (Robertson & Walker 1994; the Okapi
    // formula every production search stack runs) — the LEXICAL side
    // of hybrid retrieval, completing the story beside the embedding
    // path (`pipeline_chunk_embed_e2e`) and the fusion layer
    // (`sim_reciprocal_rank_fusion`): probe docs (doc_id%97) as
    // bag-of-words queries against candidate docs (doc_id%5), scored
    // Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)) with
    // k1=1.2, b=0.75. Same inverted-index scale shape as the
    // embedding retriever: the term equi-join only pairs docs sharing
    // a KEPT term (the df ≤ 30% stop cut — BM25's idf downweights
    // frequent terms but the JOIN must never explode on them); probe
    // postings, the per-term idf synopsis and candidate lengths are
    // all hint-free equi-joins (r11 — see bm25Pairs' hint policy). Determinism: idf's ln() quantized
    // DECIMAL(28,10) at the term grain (the JSD/WoE ln precedent),
    // per-pair term scores quantized DECIMAL(28,10) pre-sum, final
    // floor·10⁴ + ccid tiebreak.
    "text_bm25_retrieval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // r15 #5 (session 4): END-PIN the ranked top-3 frame (≤3 rows
      // per probe — KBs) so the doc-grain posting synopsis (11.6 MB
      // resident for the rest of the session in the storage census)
      // is freed at construction. Pinning the ranked OUTPUT rather
      // than the raw pair table keeps the checkpoint write trivial
      // (the raw-pair pin variant measured +0.3 s task at fixture
      // scale from its 4.7 MB block write/read).
      val tf = bm25Postings(s, d).localCheckpoint()
      val top = bm25PairsOn(tf)
        .withColumn("rank", row_number().over(Window.partitionBy("pid")
          .orderBy(col("bm25").desc, col("cid"))))
        .filter(col("rank") <= 3)
        .select(col("pid"), col("rank").cast("long").as("rank"),
          col("cid"), col("bm25"))
        .localCheckpoint(true)
      graft.Ckpt.free(tf)
      top.orderBy("pid", "rank")
    }),

    // Hybrid retrieval (r10 capstone) — THE production search
    // architecture as ONE declared plan: the BM25 lexical arm and
    // the doc-grain hashing-trick embedding arm each rank their
    // top-10 per probe, fused by Reciprocal Rank Fusion
    // (Cormack et al. 2009, k=60) over the FULL OUTER union of the
    // two candidate lists — a doc found by only one arm still
    // competes, exactly how lexical+vector hybrid search behaves.
    // Composes three verified primitives (BM25, the stop-dim-pruned
    // inverted-index cosine, RRF) without re-declaring any of their
    // internals. Determinism: each arm's rank is already
    // deterministic (floor·10⁴ + cid tiebreak); the fused score
    // 1/(60+rb) + 1/(60+rc) is a fixed two-term expression of small
    // integers (no aggregation-order hazard), floor·10⁻⁶.
    // Scale: both arms are the proven inverted-index shapes; the
    // fusion joins two ≤|probes|·10-row frames.
    "sim_hybrid_retrieval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // r15 #5 (session 4): the two arm synopses were the board's
      // LARGEST ambient holder (22.3 MB resident after this key in
      // the storage census). Both arms' ranked top-10 lists are
      // END-PINNED in ONE tagged union — a single query execution,
      // so the arms keep their stage-level parallelism (separate
      // per-arm pins measured +0.5 s wall from arm serialization) —
      // then the posting + hashed-dim synopses are freed. The tag
      // split below feeds the unchanged RRF fusion with identical
      // integer ranks.
      val tf = bm25Postings(s, d).localCheckpoint()
      val emb = cosEmbeddings(s, d).localCheckpoint()
      val arms = bm25PairsOn(tf)
        .withColumn("rk", row_number().over(Window.partitionBy("pid")
          .orderBy(col("bm25").desc, col("cid"))))
        .filter(col("rk") <= 10)
        .select(col("pid"), col("cid"), col("rk"), lit("b").as("arm"))
        .unionByName(cosPairsOn(emb)
          .withColumn("rk", row_number().over(Window.partitionBy("pid")
            .orderBy(col("cos").desc, col("cid"))))
          .filter(col("rk") <= 10)
          .select(col("pid"), col("cid"), col("rk"), lit("c").as("arm")))
        .localCheckpoint(true)
      graft.Ckpt.free(tf, emb)
      val bm = arms.filter(col("arm") === "b")
        .select(col("pid").as("bpid"), col("cid").as("bcid"),
          col("rk").as("rb"))
      val cs = arms.filter(col("arm") === "c")
        .select(col("pid").as("cpid"), col("cid").as("ccid"),
          col("rk").as("rc"))
      bm.join(cs,
          col("bpid") === col("cpid") && col("bcid") === col("ccid"),
          "full_outer")
        .select(coalesce(col("bpid"), col("cpid")).as("pid"),
          coalesce(col("bcid"), col("ccid")).as("cid"),
          col("rb"), col("rc"))
        .withColumn("rrf", floor(
          (coalesce(lit(1.0) / (lit(60.0) + col("rb").cast("double")),
            lit(0.0))
           + coalesce(lit(1.0) / (lit(60.0) + col("rc").cast("double")),
            lit(0.0))) * 1000000.0) / 1000000)
        .withColumn("rank", row_number().over(Window.partitionBy("pid")
          .orderBy(col("rrf").desc, col("cid"))))
        .filter(col("rank") <= 5)
        .select(col("pid"), col("rank").cast("long").as("rank"),
          col("cid"), col("rb").cast("long").as("rank_bm25"),
          col("rc").cast("long").as("rank_cos"), col("rrf"))
        .orderBy("pid", "rank")
    }),

    // Difference-in-differences (the canonical quasi-experimental
    // estimator, beside CUPED's variance reduction): the same unit
    // frame (ALL customers, pre/post 1998 spend, md5 hash arms), 2×2
    // cell means from exact DECIMAL sums, DiD = (T,post − T,pre) −
    // (C,post − C,pre). One-row declared output carrying the four
    // cell means, the two trends, and the interaction estimate —
    // what an experimentation readout actually reports. Scale: one
    // per-unit rollup shuffle + one 4-cell aggregate.
    "analytics_diff_in_diff" -> ((s, d) =>
      cupedUnits(s, d).agg(
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("arm") === 1, col("x").cast("decimal(38,4)"))
            .otherwise(lit(0).cast("decimal(38,4)"))).as("sxt"),
          sum(when(col("arm") === 0, col("x").cast("decimal(38,4)"))
            .otherwise(lit(0).cast("decimal(38,4)"))).as("sxc"),
          sum(when(col("arm") === 1, col("y").cast("decimal(38,4)"))
            .otherwise(lit(0).cast("decimal(38,4)"))).as("syt"),
          sum(when(col("arm") === 0, col("y").cast("decimal(38,4)"))
            .otherwise(lit(0).cast("decimal(38,4)"))).as("syc"))
        .withColumn("pre_t", floor(col("sxt").cast("double")
          / col("n_t").cast("double") * 10000.0) / 10000)
        .withColumn("pre_c", floor(col("sxc").cast("double")
          / col("n_c").cast("double") * 10000.0) / 10000)
        .withColumn("post_t", floor(col("syt").cast("double")
          / col("n_t").cast("double") * 10000.0) / 10000)
        .withColumn("post_c", floor(col("syc").cast("double")
          / col("n_c").cast("double") * 10000.0) / 10000)
        .withColumn("trend_t",
          floor((col("post_t") - col("pre_t")) * 10000.0) / 10000)
        .withColumn("trend_c",
          floor((col("post_c") - col("pre_c")) * 10000.0) / 10000)
        .withColumn("did",
          floor((col("trend_t") - col("trend_c")) * 10000.0) / 10000)
        .select(col("n_t"), col("n_c"), col("pre_t"), col("pre_c"),
          col("post_t"), col("post_c"), col("trend_t"), col("trend_c"),
          col("did"))),

    // Shapley-value channel attribution (r10; Shapley 1953, the
    // data-driven attribution of modern ad platforms — completes the
    // attribution family beside last-touch and linear, which are
    // position heuristics where THIS divides credit by marginal
    // contribution over every channel coalition): journeys = per
    // converting user, the SET of channels touched before the FIRST
    // purchase, encoded as a 4-bit mask (click=1, error=2, signup=4,
    // view=8); the coalition game v(S) = #journeys whose touchset ⊆ S
    // (conversions "explained" by S); φ(c) = Σ_{S⊆C∖c} w(|S|)·
    // (v(S∪c)−v(S)) with the |C|=4 weights kept in 24ths
    // ({6,2,2,6}/24) so EVERYTHING through φ·24 is exact integer
    // arithmetic — two final divisions only. Scale: ONE corpus pass
    // (events → per-user rollup); the entire Shapley computation runs
    // on the ≤16-row mask-count synopsis (16-row coalition spine ×
    // 4-channel spine — constant work at any corpus size).
    "analytics_attribution_shapley" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
      val bits = ev.join(firstP, Seq("user_id"))
        .filter(col("ts") < col("pts"))
        .select(col("user_id"), expr(
          """CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                             WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                             ELSE 0 END""").as("b"))
        .filter(col("b") > 0).distinct()
      val masks = firstP
        .join(bits.groupBy("user_id").agg(sum(col("b")).as("mask")),
          Seq("user_id"), "left")
        .select(coalesce(col("mask"), lit(0L)).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("cnt"))
      // coalition values over the 16-row spine: v(S) = Σ cnt[m ⊆ S]
      val v = s.range(16).select(col("id").as("cs"))
        .join(masks, expr("(mask & cs) = mask"), "left")
        .groupBy("cs").agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
      val ch = s.range(4).select(
        expr("element_at(array('click','error','signup','view'), " +
          "CAST(id + 1 AS INT))").as("channel"),
        expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)").as("cb"))
      ch.join(v.select(col("cs"), col("v").as("v0")),
          expr("(cs & cb) = 0"))
        .join(v.select(col("cs").as("cs1"), col("v").as("v1")),
          expr("cs1 = cs + cb"))
        .withColumn("w24", expr(
          """CASE (cs & 1) + (shiftright(cs, 1) & 1)
                  + (shiftright(cs, 2) & 1) + (shiftright(cs, 3) & 1)
             WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"""))
        .groupBy("channel", "cb")
        .agg(sum(col("w24") * (col("v1") - col("v0"))).as("phi24"))
        .crossJoin(broadcast(
          masks.agg(sum(when(col("mask") =!= 0L, col("cnt"))
            .otherwise(0L)).as("n_explained"))))
        .select(col("channel"), col("phi24"),
          (floor(col("phi24").cast("double") / 24.0 * 10000.0) / 10000)
            .as("phi"),
          // nullif guard: a corpus where no converting user has a
          // pre-purchase touch (n_explained = 0) declares NULL share
          // rather than an engine-dependent inf/NaN
          (floor(col("phi24").cast("double") / 24.0
            / nullif(col("n_explained"), lit(0L)).cast("double")
            * 10000.0) / 10000)
            .as("share_of_explained"))
        .orderBy("channel")
    }),

    // PPS systematic sampling (r10; Hartley & Rao 1962 — the
    // probability-proportional-to-size design behind every
    // revenue-weighted audit sample): units = customers, size =
    // lifetime spend in integer CENTS; walk the cumulative-size line
    // and select a unit once per 1%-of-total boundary it crosses —
    // n=100 draws, a whale spanning k boundaries is drawn k times
    // (the certainty-unit convention, DECLARED via `crossings`).
    // The selection test is PURE INTEGER: (csum·100) div total >
    // ((csum−size)·100) div total. The global cumulative sum is the
    // scale-safe ScaleRank.withGlobalCumsum two-pass (per-range-
    // partition running sums + a broadcast prefix-sum synopsis —
    // never a single-partition window over the unit table); the
    // oracle uses the naive single-node window, which is exactly
    // what the two-pass form must reproduce bit-for-bit.
    "sample_pps_systematic" -> ((s, d) => {
      val units = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("cents"))
      val cum = ScaleRank.withGlobalCumsum(units,
        Seq(col("o_custkey")), col("cents"))
      // total = the last running sum — one tiny aggregate over the
      // frame withGlobalCumsum already checkpointed, not a second
      // scan+rollup of orders
      val tot = cum.agg(max(col("csum")).as("total"))
      cum.crossJoin(broadcast(tot))
        // The boundary test widens through DECIMAL(38,0) before the
        // ×100: total cents at the 100 TB design point is ~2e18, so
        // csum·100 would wrap int64 silently under Spark's non-ANSI
        // arithmetic (the oracle's HUGEINT side would not — a silent
        // cross-engine divergence exactly at target scale). DECIMAL
        // products are exact, `div` is floor division on positive
        // operands in both engines, and the per-row result is ≤ 100.
        .withColumn("crossings", expr(
          """CAST(CAST(csum AS DECIMAL(38,0)) * 100 div total
             - CAST(csum - cents AS DECIMAL(38,0)) * 100 div total
             AS BIGINT)"""))
        .filter(col("crossings") > 0)
        .select(col("o_custkey"), col("cents"), col("crossings"))
        .orderBy("o_custkey")
    }),

    // Local clustering-coefficient census (r10; Watts & Strogatz
    // 1998) — the per-node companion of `graph_triangle_count`'s
    // single global CC: per node, lcc = 2·triangles(v) /
    // (deg(v)·(deg(v)−1)) over the shared co-purchase graph; every
    // oriented triangle (a<b<c, the same wedge equi-join — never
    // all-pairs) credits all three corners. Declared as the
    // 10-bucket lcc histogram over deg≥2 nodes (node-grain output
    // would be corpus-proportional; the distribution is the useful
    // census) + per-bucket exact-decimal mean. One wedge join + two
    // bounded aggregates.
    "graph_local_clustering" -> ((s, d) => {
      val e = GraphOps.coPurchaseEdges(s, d, 10).localCheckpoint()
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"),
          col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
        .select(col("e1.u").as("a"), col("e1.v").as("b"),
          col("e2.v").as("c"))
      val perNode = tri.select(col("a").as("node"))
        .unionAll(tri.select(col("b").as("node")))
        .unionAll(tri.select(col("c").as("node")))
        .groupBy("node").agg(count(lit(1)).as("t"))
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      deg.filter(col("deg") >= 2)
        .join(perNode, Seq("node"), "left")
        .withColumn("lcc",
          floor(lit(2.0) * coalesce(col("t"), lit(0L)).cast("double")
            / (col("deg") * (col("deg") - 1)).cast("double")
            * 10000.0) / 10000)
        .withColumn("bucket",
          least(floor(col("lcc") * 10).cast("long"), lit(9L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_nodes"),
          (floor(sum(col("lcc").cast("decimal(28,10)")).cast("double")
            / count(lit(1)).cast("double") * 10000.0) / 10000)
            .as("mean_lcc"))
        .orderBy("bucket")
    }),

    // V-shape reversal census (MATCH_RECOGNIZE-lite) per segment over
    // the daily mean-order-value series: a V at day t = strict local
    // minimum whose both neighbors sit ≥ 5% above it — the
    // pattern-detection window shape (beside peaks, which
    // `timeseries_peak_detect` already censuses as maxima with an
    // absolute threshold). Day means ×10⁴-quantized to integers so
    // the lag/lead compares and the 5% test (100·neighbor ≥ 105·min)
    // are pure integer ops — hash-exact. One ordered window per
    // segment, no joins.
    "window_pattern_vshape" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("seg"), to_date(col("o_orderdate")).as("day"))
        .agg((floor(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
          / count(lit(1)).cast("double") * 10000.0)).cast("long")
          .as("v4"))
      val w = Window.partitionBy("seg").orderBy("day")
      daily
        .withColumn("pv", lag(col("v4"), 1).over(w))
        .withColumn("nv", lead(col("v4"), 1).over(w))
        .withColumn("is_v",
          col("pv").isNotNull && col("nv").isNotNull &&
          col("pv") * 100 >= col("v4") * 105 &&
          col("nv") * 100 >= col("v4") * 105)
        .withColumn("depth",
          when(col("is_v"),
            least(col("pv"), col("nv")) - col("v4")).otherwise(0L))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("is_v"), 1L).otherwise(0L)).as("n_vshapes"),
          max(col("depth")).as("max_depth4"))
        .orderBy("seg")
    }),

    // SAX symbolization (r10; Lin, Keogh, Lonardi & Chiu 2003, "A
    // Symbolic Representation of Time Series" — THE classic discrete
    // representation behind motif discovery, symbolic indexing and
    // sequence anomaly detection at scale): the ×10⁴-quantized daily
    // mean-order-value series per segment (window_pattern_vshape's
    // spine) is z-normalized per segment, each day mapped to a
    // 4-letter alphabet at the N(0,1) quartile breakpoints
    // {−β, 0, β}, β = 0.6745, and consecutive symbol triples form
    // SAX words; the declared result is the (segment, word) census —
    // the motif histogram (≤ 5·4³ rows, bounded). The symbol test is
    // EXACT INTEGER throughout: z ≷ β reduces to comparing
    // L = n·v − Σv against β·n·σ, and squaring both sides makes it
    // L²·10⁸ ≷ 6745²·(n·Σv² − (Σv)²) with 6745² = 45495025 —
    // DECIMAL(38,0) (HUGEINT in the oracle) products, no sqrt, no
    // doubles, identical bits in both engines by construction. σ = 0
    // degenerates to L = 0 → 'c' under the declared boundary
    // convention (a: z<−β, b: −β≤z<0, c: 0≤z≤β, d: z>β). Scale: one
    // corpus pass collapses to the calendar-bounded daily grain
    // (~2 400 rows/segment at ANY sf — the date range is fixed), so
    // the moment window, the ordered lead window and the census all
    // run on a synopsis; magnitudes are price-distribution-bounded
    // (L ≲ 10¹³, L²·10⁸ ≲ 10³⁴ < 10³⁸), sf-invariant for the same
    // calendar reason.
    "timeseries_sax_words" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("seg"), to_date(col("o_orderdate")).as("day"))
        .agg((floor(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
          / count(lit(1)).cast("double") * 10000.0)).cast("long")
          .as("v4"))
      val wSeg = Window.partitionBy("seg")
      val wOrd = Window.partitionBy("seg").orderBy("day")
      val sym = daily
        .withColumn("n", count(lit(1)).over(wSeg))
        .withColumn("sv", sum(col("v4")).over(wSeg))
        .withColumn("sq", sum((col("v4").cast("decimal(19,0)")
          * col("v4")).cast("decimal(38,0)")).over(wSeg))
        .withColumn("l", col("n") * col("v4") - col("sv"))
        .withColumn("l2e8", (col("l").cast("decimal(19,0)") * col("l"))
          .cast("decimal(38,0)") * lit(100000000L))
        .withColumn("dd", col("n").cast("decimal(38,0)") * col("sq")
          - (col("sv").cast("decimal(19,0)") * col("sv"))
            .cast("decimal(38,0)"))
        .withColumn("bd", lit(45495025L).cast("decimal(38,0)")
          * col("dd"))
        .withColumn("sym",
          when(col("l") < 0,
            when(col("l2e8") > col("bd"), "a").otherwise("b"))
          .otherwise(
            when(col("l") > 0 && col("l2e8") > col("bd"), "d")
              .otherwise("c")))
      val census = sym
        .withColumn("word", concat(col("sym"),
          lead(col("sym"), 1).over(wOrd),
          lead(col("sym"), 2).over(wOrd)))
        .filter(col("word").isNotNull)
        .groupBy("seg", "word").agg(count(lit(1)).as("n_windows"))
      census
        .withColumn("total", sum(col("n_windows")).over(wSeg))
        .select(col("seg"), col("word"), col("n_windows"),
          (floor(col("n_windows").cast("double")
            / col("total").cast("double") * 10000.0) / 10000)
            .as("share"))
        .orderBy("seg", "word")
    }),

    // RAKE keyword extraction (r10; Rose, Engel, Cramer & Cowley
    // 2010, "Automatic Keyword Extraction from Individual Documents"
    // — the classic unsupervised keyphrase scorer, a curation staple
    // for corpus topic profiling): candidate phrases are the maximal
    // token runs between stopword boundaries (the fixture's function
    // words 'a'/'the'); word score = degree/frequency where freq(w) =
    // corpus occurrences inside phrases and deg(w) = Σ over those
    // occurrences of the containing phrase's length; phrase score =
    // Σ member-word scores. EXACT INTEGER throughout: word score is
    // kept ×10⁴ as (deg·10⁴) div freq (floor division, bit-identical
    // in both engines), phrase score is an integer sum of those —
    // no doubles anywhere. Declared: top-20 phrases by score
    // (orderBy().limit → TakeOrderedAndProject, per-partition heaps,
    // never a single-reducer sort). Scale: the stop-count running sum
    // is a DOC-grain ordered window (never global), word stats are
    // map-side-combinable vocab-key aggregates, the score join is a
    // vocab-key equi-join (bounded by vocabulary, deliberately NOT
    // broadcast — vocab is corpus-dependent), phrase assembly is
    // (doc, phrase)-grain.
    "text_keyword_rake" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "w")
      val wDoc = Window.partitionBy("doc_id").orderBy("p")
      val ph = tok
        .withColumn("isstop", col("w").isin("a", "the"))
        .withColumn("pid",
          sum(when(col("isstop"), 1L).otherwise(0L)).over(wDoc))
        .filter(!col("isstop") && col("w") =!= "")
        .select(col("doc_id"), col("pid"), col("p"), col("w"))
      // r12 (VERDICT r10 #5 carried): phrase length as a
      // (doc_id, pid)-partitioned count window instead of a groupBy +
      // join-back — HashPartitioning(doc_id) from the stop-count
      // window already satisfies ClusteredDistribution(doc_id, pid),
      // so the window adds ZERO exchanges where the join added one
      // (executed plan shows ReusedExchange of the doc_id exchange;
      // ≤3 shuffle exchanges total, pinned in Analytics6Spec;
      // 3.34 → 3.17 s at the sf0.1 bench).
      val t2 = ph.withColumn("plen",
        count(lit(1)).over(Window.partitionBy("doc_id", "pid")))
      val wsc = t2.groupBy("w")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        // deg is corpus-proportional (Σ plen over occurrences): widen
        // through DECIMAL(38,0) before the ×10⁴ so the intermediate
        // can't overflow int64 at extreme corpus scale; the RESULT is
        // tiny (≤ 10⁴·max phrase length, since deg ≤ freq·max_plen)
        .select(col("w"),
          expr("CAST(CAST(deg AS DECIMAL(38,0)) * 10000 div freq AS BIGINT)")
            .as("wscore4"))
      t2.join(wsc, Seq("w"))
        .groupBy("doc_id", "pid")
        .agg(
          concat_ws(" ", expr(
            "transform(sort_array(collect_list(struct(p, w))), x -> x.w)"))
            .as("phrase"),
          count(lit(1)).as("n_words"),
          sum(col("wscore4")).as("score4"))
        .groupBy("phrase")
        .agg(max(col("n_words")).as("n_words"),
          count(lit(1)).as("n_occ"), max(col("score4")).as("score4"))
        .orderBy(col("score4").desc, col("phrase")).limit(20)
        .select(col("phrase"), col("n_words"), col("n_occ"),
          col("score4"))
        .orderBy(col("score4").desc, col("phrase"))
    }),

    // k-step MATCH_RECOGNIZE-style pattern matcher (r12, VERDICT r11
    // #4) — generalizes analytics_funnel_strict's HARDCODED 3-step
    // view→click→purchase to a DECLARED pattern alphabet: `steps` is
    // a list of (event_type, deadline-from-previous-step) pairs that
    // COMPILES into a chain of filtered running-max carries over ONE
    // (us, event_id)-ordered window pass per user — st_i = latest
    // time step i completed given st_{i-1} within its deadline
    // (st_{i-1} ≤ current us by construction, so the deadline test
    // needs no lower bound). Exactly MATCH_RECOGNIZE's linear
    // one-pass NFA discipline for strictly-ordered patterns: k bounds
    // the column count at PLAN time, the scan stays O(k·events), no
    // per-step self-joins (a k-way event join is quadratic per user
    // and melts on power users; this shuffles ONCE on user_id).
    // Declared output: per-step distinct-user reach — the funnel
    // attrition profile. Deadlines sized to the fixture's ~7 h median
    // inter-event gap (12 h/8 h/8 h → 150/150/139/38/8 at sf0.01) so
    // every deadline'd step attrits visibly.
    "window_pattern_kstep" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val H = 3600L * 1000000 // 1 h in µs
      val steps: Seq[(String, Option[Long])] = Seq(
        "signup" -> None,
        "view" -> Some(12 * H),
        "click" -> Some(8 * H),
        "purchase" -> Some(8 * H))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val staged = steps.zipWithIndex.foldLeft(e) {
        case (df, ((t, dl), i)) =>
          val cond = dl match {
            case None => col("event_type") === t
            case Some(win) => col("event_type") === t &&
              col(s"st${i - 1}").isNotNull &&
              col("us") - col(s"st${i - 1}") <= win
          }
          df.withColumn(s"st$i", max(when(cond, col("us"))).over(w))
      }
      val reach = steps.indices.map(i =>
        countDistinct(when(col(s"st$i").isNotNull, col("user_id")))
          .as(s"n_step$i"))
      staged.agg(countDistinct(col("user_id")).as("n_users"),
        reach: _*)
    }),

    // MATCH_RECOGNIZE alternation (r14, VERDICT r13 gap #2) — the
    // pattern `signup (view{≤12h} | click{≤4h}) purchase{≤8h}`:
    // each alternative runs its OWN filtered running-max carry chain
    // off the shared st0, and the alternation state is
    // greatest(stv, stc) — the NFA holds both branch states, and
    // because the continuation deadline is the same for both, a
    // purchase is within deadline of SOME branch iff it is within
    // deadline of the most recent one, so the greatest-carry is
    // exactly the automaton's "either" state (this is the general
    // compilation rule for A|B under equal continuation windows; the
    // branch DEADLINES differ — 12 h vs 4 h — which is what makes
    // alternation non-collapsible into one disjunctive filter). Same
    // one-window-pass, one-user-shuffle discipline as
    // window_pattern_kstep; declared output adds per-BRANCH reach —
    // the funnel diagnostic alternation exists to answer.
    "window_pattern_alternation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val H = 3600L * 1000000 // 1 h in µs
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("st0",
          max(when(col("event_type") === "signup", col("us"))).over(w))
        .withColumn("stv",
          max(when(col("event_type") === "view" && col("st0").isNotNull
            && col("us") - col("st0") <= 12 * H, col("us"))).over(w))
        .withColumn("stc",
          max(when(col("event_type") === "click" && col("st0").isNotNull
            && col("us") - col("st0") <= 4 * H, col("us"))).over(w))
        .withColumn("st1", greatest(col("stv"), col("stc")))
        .withColumn("st2",
          max(when(col("event_type") === "purchase"
            && col("st1").isNotNull
            && col("us") - col("st1") <= 8 * H, col("us"))).over(w))
      staged.agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("st0").isNotNull, col("user_id")))
          .as("n_signup"),
        countDistinct(when(col("stv").isNotNull, col("user_id")))
          .as("n_alt_view"),
        countDistinct(when(col("stc").isNotNull, col("user_id")))
          .as("n_alt_click"),
        countDistinct(when(col("st1").isNotNull, col("user_id")))
          .as("n_alt_either"),
        countDistinct(when(col("st2").isNotNull, col("user_id")))
          .as("n_purchase"))
    }),

    // MATCH_RECOGNIZE negation/absence (r14) — the fourth pattern
    // operator: `signup (!click)* purchase{≤24h}` — a purchase
    // within deadline of the latest signup counts only when NO click
    // intervened (funnel-purity / fraud-pattern primitive; the NOT
    // is what plain funnels can't express). Compilation is one extra
    // carry: lastc = latest click; the absence test is
    // lastc IS NULL OR lastc < st0 — "no click since the matched
    // signup" — evaluated per purchase row. The declared output
    // keeps BOTH the pure and the tainted deadline-purchases, so the
    // negation's selectivity is visible in the result. One window
    // pass, one user-grain shuffle.
    "window_pattern_negation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val H = 3600L * 1000000
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("st0",
          max(when(col("event_type") === "signup", col("us"))).over(w))
        .withColumn("lastc",
          max(when(col("event_type") === "click", col("us"))).over(w))
        .withColumn("in_deadline", col("event_type") === "purchase"
          && col("st0").isNotNull && col("us") - col("st0") <= 24 * H)
        .withColumn("pure", col("in_deadline")
          && (col("lastc").isNull || col("lastc") < col("st0")))
      // purchase legs count EVENTS, not distinct users — almost every
      // user has SOME pre-click purchase, so user-grain purity reads
      // near-vacuous (147/148 on the fixture) while the event-grain
      // split shows the negation's real selectivity
      staged.agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("st0").isNotNull, col("user_id")))
          .as("n_signup"),
        count(when(col("in_deadline"), lit(1)))
          .as("n_deadline_purchases"),
        count(when(col("pure"), lit(1))).as("n_pure_purchases"),
        count(when(col("in_deadline") && !col("pure"), lit(1)))
          .as("n_tainted_purchases"))
    }),

    // MATCH_RECOGNIZE bounded quantifier (r14) — `signup view{2,4}
    // purchase`: like the Kleene key, views chain at ≤8 h gaps and
    // the chain must start within 12 h of the latest signup, but the
    // match may end only at the 2nd..4th view of a chain (B{2,4} —
    // the "engaged but not doomscrolling" funnel window). One more
    // column on the kleene scaffolding: the view's POSITION in its
    // chain is a running count over the same (user-ordered) frame
    // minus the count at the chain head (both ride the ONE user
    // exchange), and the purchase carry keys off views at positions
    // 2..4 of valid chains. Output: reach + how often the quantifier
    // (vs plain B+) is what gates the match.
    "window_pattern_quantified" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val H = 3600L * 1000000
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val isView = col("event_type") === "view"
      val base = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("st0",
          max(when(col("event_type") === "signup", col("us"))).over(w))
        .withColumn("pv", max(when(isView, col("us"))).over(wPrev))
        .withColumn("head", isView &&
          (col("pv").isNull || col("us") - col("pv") > 8 * H))
        .withColumn("cid",
          sum(when(col("head"), 1L).otherwise(0L)).over(w))
        // views-so-far running count; position within chain = the
        // count here minus the count just before the chain head
        .withColumn("nv", sum(when(isView, 1L).otherwise(0L)).over(w))
      val wChain = Window.partitionBy("user_id", "cid")
      val staged = base
        .withColumn("chain_start",
          min(when(col("head"), col("us"))).over(wChain))
        .withColumn("head_st0",
          min(when(col("head"), coalesce(col("st0"), lit(-1L))))
            .over(wChain))
        .withColumn("head_nv",
          min(when(col("head"), col("nv"))).over(wChain))
        .withColumn("chain_valid", col("head_st0") >= 0 &&
          col("chain_start") - col("head_st0") <= 12 * H)
        .withColumn("pos", col("nv") - col("head_nv") + 1)
        .withColumn("stq", max(when(isView && col("chain_valid")
          && col("pos").between(2, 4), col("us"))).over(w))
        .withColumn("stv",
          max(when(isView && col("chain_valid"), col("us"))).over(w))
        .withColumn("st2q",
          max(when(col("event_type") === "purchase"
            && col("stq").isNotNull
            && col("us") - col("stq") <= 8 * H, col("us"))).over(w))
        .withColumn("st2plus",
          max(when(col("event_type") === "purchase"
            && col("stv").isNotNull
            && col("us") - col("stv") <= 8 * H, col("us"))).over(w))
      staged.agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("stq").isNotNull, col("user_id")))
          .as("n_quant_reach"),
        countDistinct(when(col("st2q").isNotNull, col("user_id")))
          .as("n_purchase_quant"),
        countDistinct(when(col("st2plus").isNotNull, col("user_id")))
          .as("n_purchase_plus"),
        count(when(isView && col("chain_valid")
          && col("pos") > 4, lit(1))).as("n_views_beyond_4"))
    }),

    // MATCH_RECOGNIZE Kleene-plus (r14) — the third pattern operator
    // beside kstep's sequence and alternation's A|B, completing the
    // compile-to-carries family: `signup view+ purchase` where the
    // view CHAIN has an intra-B deadline (consecutive views ≤ 8 h
    // apart) and must START within 12 h of the latest signup;
    // purchase within 8 h of the last matched view — and since B+
    // may stop at ANY view of a chain, "last matched view" is the
    // latest view belonging to a VALID chain (any earlier chain view
    // is farther from the purchase, so the running max IS the NFA
    // state). Compilation: sessionize the view subsequence (gap >
    // 8 h starts a chain; lag via a conditional max over the
    // preceding-rows frame so non-view rows never break a chain),
    // validate each chain ONCE at its head row (head's st0 within
    // 12 h — a (user, chain) window that rides the same user
    // partitioning, zero extra exchanges), then one more carry for
    // purchase. Still ONE user-grain shuffle end to end.
    "window_pattern_kleene" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val H = 3600L * 1000000
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val isView = col("event_type") === "view"
      val base = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("st0",
          max(when(col("event_type") === "signup", col("us"))).over(w))
        // latest PRECEDING view (current row excluded, non-view rows
        // transparent) — the lag that segments the view chains
        .withColumn("pv", max(when(isView, col("us"))).over(wPrev))
        .withColumn("head", isView &&
          (col("pv").isNull || col("us") - col("pv") > 8 * H))
        .withColumn("cid",
          sum(when(col("head"), 1L).otherwise(0L)).over(w))
      val wChain = Window.partitionBy("user_id", "cid")
      val staged = base
        // the chain head's (start, st0) — evaluated once per chain,
        // broadcast to every member by the (user, cid) window
        .withColumn("chain_start",
          min(when(col("head"), col("us"))).over(wChain))
        .withColumn("head_st0",
          min(when(col("head"), coalesce(col("st0"), lit(-1L))))
            .over(wChain))
        .withColumn("chain_valid", col("head_st0") >= 0 &&
          col("chain_start") - col("head_st0") <= 12 * H)
        .withColumn("stv",
          max(when(isView && col("chain_valid"), col("us"))).over(w))
        .withColumn("st2",
          max(when(col("event_type") === "purchase"
            && col("stv").isNotNull
            && col("us") - col("stv") <= 8 * H, col("us"))).over(w))
      staged.agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("st0").isNotNull, col("user_id")))
          .as("n_signup"),
        countDistinct(when(col("head"), struct(col("user_id"), col("cid"))))
          .as("n_chains"),
        countDistinct(when(col("head") && col("chain_valid"),
          struct(col("user_id"), col("cid")))).as("n_valid_chains"),
        countDistinct(when(col("stv").isNotNull, col("user_id")))
          .as("n_chain_users"),
        countDistinct(when(col("st2").isNotNull, col("user_id")))
          .as("n_purchase"))
    }),

    // Tukey median polish, two sweeps (r12) — the ROBUST two-way
    // decomposition beside the mean-based keys (Theil–Sen is the
    // robust trend; this is the robust ANOVA): revenue(pri, month) =
    // grand + row_effect(pri) + col_effect(month) + residual, fitted
    // by alternately subtracting row then column MEDIANS (outlier
    // months can't drag a priority's effect the way means let them).
    // Integer-exact fixpoint: cells carry cents×16, and each of the
    // 4 median steps halves the guaranteed power of two (median of
    // an even count is (a+b)/2 — ×16 buys exactly the 4 halvings two
    // sweeps need), so every median is an exact integer in BOTH
    // engines (percentile ↔ quantile_cont on exact-integral doubles
    // < 2^53, CAST BIGINT). Everything after the one (pri, month)
    // aggregate is a 5×~84 synopsis; each step is one group median +
    // one equi-join back.
    "analytics_median_polish" -> ((s, d) => {
      val cells = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 1600)
          .cast("long").as("v"))
        .localCheckpoint()
      var t = cells.withColumn("roweff", lit(0L))
        .withColumn("coleff", lit(0L))
      for (_ <- 1 to 2) {
        val rm = t.groupBy("pri")
          .agg(expr("CAST(percentile(v, 0.5) AS BIGINT)").as("rm"))
        val tr = t.join(rm, "pri")
          .withColumn("v", col("v") - col("rm"))
          .withColumn("roweff", col("roweff") + col("rm")).drop("rm")
          .localCheckpoint()
        graft.Ckpt.free(t) // superseded sweep (no-op on the lazy t0; r15 #5)
        t = tr
        val cm = t.groupBy("mon")
          .agg(expr("CAST(percentile(v, 0.5) AS BIGINT)").as("cm"))
        val tc = t.join(cm, "mon")
          .withColumn("v", col("v") - col("cm"))
          .withColumn("coleff", col("coleff") + col("cm")).drop("cm")
          .localCheckpoint()
        graft.Ckpt.free(t)
        t = tc
      }
      // the cell synopsis was absorbed by the first sweep's checkpoint
      graft.Ckpt.free(cells)
      t.groupBy("pri")
        .agg(count(lit(1)).as("n_months"),
          (min(col("roweff")).cast("double") / 1600.0).as("row_effect"),
          (max(abs(col("v"))).cast("double") / 1600.0).as("max_abs_resid"),
          count(when(col("v") === 0, 1)).as("n_zero_resid"))
        .orderBy("pri")
    }),

    // Group-sequential SPRT (r12) — the SEQUENTIAL leg of the
    // experimentation family (t-test/CUPED/DiD are fixed-horizon;
    // real experiment platforms peek, and naive peeking inflates α —
    // Wald's SPRT is the always-valid answer). Symmetric hypotheses
    // (success odds 2:1 vs 1:2, i.e. p₁ = 2p₀ odds) make the
    // log-likelihood walk EXACTLY an integer ±1-per-event random walk
    // with integer boundaries ±K (ln(2)·(s−f) ⋛ ±K·ln2 — the ln2
    // divides out), so the whole test is transcendental-free and
    // mirrors bit-for-bit; K=25 ≈ α=β=2^-25-grade evidence at event
    // grain, reached mid-experiment by the fixture's p≈0.4 drift.
    // Scale shape: this is the GROUP-sequential form — per-event
    // steps aggregate per (arm, daily look) FIRST (a plain groupBy:
    // map-side partials, shuffle carries 8 arms × 30 days rows),
    // and the sequential walk runs over that bounded synopsis (the
    // per-arm window rides a ≤ arms×calendar frame — never
    // event-grain; a per-EVENT walk would serialize each arm's
    // stream, which is exactly what interim "looks" exist to avoid).
    // First-crossing pick is a rank-pinning row_number filter
    // (hint-audit exempt class).
    "analytics_sprt_group_sequential" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K = 25
      val looks = Tables.events(s, d)
        // 'error' events are not Bernoulli outcomes of the experiment
        // — excluding them leaves success (purchase|click) vs failure
        // (view|signup) balanced 2:2, i.e. a DRIFTLESS null walk:
        // crossings are variance-driven, so arms decide at different
        // looks in both directions and one fixture arm never decides
        // (all three decision branches are live data, not dead code)
        .filter(col("event_type") =!= "error")
        .select((col("user_id") % 8).as("arm"), to_date(col("ts")).as("look"),
          when(col("event_type").isin("purchase", "click"), 1L)
            .otherwise(-1L).as("step"))
        .groupBy("arm", "look")
        .agg(sum(col("step")).as("net"), count(lit(1)).as("n"))
      val w = Window.partitionBy("arm").orderBy("look")
      val walked = looks
        .withColumn("walk", sum(col("net")).over(w))
        .withColumn("li", row_number().over(w).cast("long"))
      val hit = walked.filter(abs(col("walk")) >= K)
        .withColumn("rn",
          row_number().over(Window.partitionBy("arm").orderBy("li")))
        .filter(col("rn") === 1)
        .select(col("arm"), col("li").as("decided_at"),
          col("walk").as("walk_dec"))
      val tot = walked.groupBy("arm").agg(
        sum(col("n")).as("n_events"), count(lit(1)).as("n_looks"),
        sum(col("net")).as("final_walk"))
      tot.join(hit, Seq("arm"), "left")
        .select(col("arm"), col("n_events"), col("n_looks"),
          coalesce(col("decided_at"), lit(-1L)).as("decided_at"),
          when(col("walk_dec") >= K, lit("accept_h1"))
            .when(col("walk_dec") <= -K, lit("accept_h0"))
            .otherwise(lit("continue")).as("decision"),
          coalesce(col("walk_dec"), col("final_walk")).as("walk_at"),
          col("final_walk"))
        .orderBy("arm")
    }),
  )

  /** Median-polish oracle: the four median/subtract steps generated
    * from one template (the markov_hitting pattern). */
  private def medianPolishSql: String = {
    val sweeps = (1 to 2).map { r =>
      val prev = if (r == 1) "t0" else s"t${r - 1}"
      s"""rm$r AS (SELECT pri, CAST(quantile_cont(v, 0.5) AS BIGINT)
                     AS rm
                   FROM $prev GROUP BY pri),
          tr$r AS MATERIALIZED (SELECT t.pri, t.mon, t.v - rm.rm AS v,
                   t.roweff + rm.rm AS roweff, t.coleff
                   FROM $prev t JOIN rm$r rm ON rm.pri = t.pri),
          cm$r AS (SELECT mon, CAST(quantile_cont(v, 0.5) AS BIGINT)
                     AS cm
                   FROM tr$r GROUP BY mon),
          t$r AS MATERIALIZED (SELECT t.pri, t.mon, t.v - cm.cm AS v,
                   t.roweff, t.coleff + cm.cm AS coleff
                   FROM tr$r t JOIN cm$r cm ON cm.mon = t.mon)"""
    }.mkString(",\n")
    s"""WITH cells AS MATERIALIZED (SELECT o_orderpriority AS pri,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 1600
                   AS BIGINT) AS v
            FROM orders GROUP BY 1, 2),
          t0 AS (SELECT pri, mon, v, CAST(0 AS BIGINT) AS roweff,
                        CAST(0 AS BIGINT) AS coleff
                 FROM cells),
          $sweeps
       SELECT pri, count(*) AS n_months,
              CAST(min(roweff) AS DOUBLE) / 1600.0 AS row_effect,
              CAST(max(abs(v)) AS DOUBLE) / 1600.0 AS max_abs_resid,
              count(CASE WHEN v = 0 THEN 1 END) AS n_zero_resid
       FROM t2 GROUP BY pri ORDER BY pri"""
  }

  val oracles: Map[String, String] = Map(
    "analytics_median_polish" -> medianPolishSql,
    "analytics_sprt_group_sequential" ->
      """WITH lk AS (SELECT user_id % 8 AS arm, CAST(ts AS DATE) AS look,
                            CAST(sum(CASE WHEN event_type IN
                                   ('purchase', 'click')
                                 THEN 1 ELSE -1 END) AS BIGINT) AS net,
                            count(*) AS n
                     FROM events WHERE event_type <> 'error'
                     GROUP BY arm, look),
              wk AS (SELECT arm, look, net, n,
                            CAST(sum(net) OVER (PARTITION BY arm
                              ORDER BY look) AS BIGINT) AS walk,
                            CAST(row_number() OVER (PARTITION BY arm
                              ORDER BY look) AS BIGINT) AS li
                     FROM lk),
              hit AS (SELECT arm, li AS decided_at, walk AS walk_dec
                      FROM (SELECT arm, li, walk,
                                   row_number() OVER (PARTITION BY arm
                                     ORDER BY li) AS rn
                            FROM wk WHERE abs(walk) >= 25)
                      WHERE rn = 1),
              tot AS (SELECT arm, CAST(sum(n) AS BIGINT) AS n_events,
                             count(*) AS n_looks,
                             CAST(sum(net) AS BIGINT) AS final_walk
                      FROM wk GROUP BY arm)
         SELECT t.arm, n_events, n_looks,
                coalesce(h.decided_at, -1) AS decided_at,
                CASE WHEN h.walk_dec >= 25 THEN 'accept_h1'
                     WHEN h.walk_dec <= -25 THEN 'accept_h0'
                     ELSE 'continue' END AS decision,
                coalesce(h.walk_dec, t.final_walk) AS walk_at,
                final_walk
         FROM tot t LEFT JOIN hit h ON h.arm = t.arm
         ORDER BY t.arm""",
    "window_pattern_kstep" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
              s0 AS (SELECT user_id, event_id, event_type, us,
                            max(CASE WHEN event_type = 'signup'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st0
                     FROM e),
              s1 AS (SELECT *, max(CASE WHEN event_type = 'view'
                                     AND st0 IS NOT NULL
                                     AND us - st0 <= 43200000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st1
                     FROM s0),
              s2 AS (SELECT *, max(CASE WHEN event_type = 'click'
                                     AND st1 IS NOT NULL
                                     AND us - st1 <= 28800000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st2
                     FROM s1),
              s3 AS (SELECT *, max(CASE WHEN event_type = 'purchase'
                                     AND st2 IS NOT NULL
                                     AND us - st2 <= 28800000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st3
                     FROM s2)
         SELECT count(DISTINCT user_id) AS n_users,
                count(DISTINCT CASE WHEN st0 IS NOT NULL
                                    THEN user_id END) AS n_step0,
                count(DISTINCT CASE WHEN st1 IS NOT NULL
                                    THEN user_id END) AS n_step1,
                count(DISTINCT CASE WHEN st2 IS NOT NULL
                                    THEN user_id END) AS n_step2,
                count(DISTINCT CASE WHEN st3 IS NOT NULL
                                    THEN user_id END) AS n_step3
         FROM s3""",
    "window_pattern_alternation" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
              s0 AS (SELECT user_id, event_id, event_type, us,
                            max(CASE WHEN event_type = 'signup'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st0
                     FROM e),
              s1 AS (SELECT *,
                            max(CASE WHEN event_type = 'view'
                                     AND st0 IS NOT NULL
                                     AND us - st0 <= 43200000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS stv,
                            max(CASE WHEN event_type = 'click'
                                     AND st0 IS NOT NULL
                                     AND us - st0 <= 14400000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS stc
                     FROM s0),
              s2 AS (SELECT *, greatest(stv, stc) AS st1 FROM s1),
              s3 AS (SELECT *,
                            max(CASE WHEN event_type = 'purchase'
                                     AND st1 IS NOT NULL
                                     AND us - st1 <= 28800000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st2
                     FROM s2)
         SELECT count(DISTINCT user_id) AS n_users,
                count(DISTINCT CASE WHEN st0 IS NOT NULL
                                    THEN user_id END) AS n_signup,
                count(DISTINCT CASE WHEN stv IS NOT NULL
                                    THEN user_id END) AS n_alt_view,
                count(DISTINCT CASE WHEN stc IS NOT NULL
                                    THEN user_id END) AS n_alt_click,
                count(DISTINCT CASE WHEN st1 IS NOT NULL
                                    THEN user_id END) AS n_alt_either,
                count(DISTINCT CASE WHEN st2 IS NOT NULL
                                    THEN user_id END) AS n_purchase
         FROM s3""",
    "window_pattern_quantified" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
              s0 AS (SELECT *,
                            max(CASE WHEN event_type = 'signup'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st0,
                            max(CASE WHEN event_type = 'view'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pv
                     FROM e),
              s1 AS (SELECT *,
                            (event_type = 'view' AND
                             (pv IS NULL OR us - pv > 28800000000))
                              AS head
                     FROM s0),
              s2 AS (SELECT *,
                            sum(CASE WHEN head THEN 1 ELSE 0 END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cid,
                            sum(CASE WHEN event_type = 'view'
                                     THEN 1 ELSE 0 END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS nv
                     FROM s1),
              s3 AS (SELECT *,
                            min(CASE WHEN head THEN us END)
                              OVER (PARTITION BY user_id, cid)
                              AS chain_start,
                            min(CASE WHEN head
                                     THEN coalesce(st0, -1) END)
                              OVER (PARTITION BY user_id, cid)
                              AS head_st0,
                            min(CASE WHEN head THEN nv END)
                              OVER (PARTITION BY user_id, cid)
                              AS head_nv
                     FROM s2),
              s4 AS (SELECT *,
                            (head_st0 >= 0 AND
                             chain_start - head_st0 <= 43200000000)
                              AS chain_valid,
                            nv - head_nv + 1 AS pos
                     FROM s3),
              s5 AS (SELECT *,
                            max(CASE WHEN event_type = 'view'
                                     AND chain_valid
                                     AND pos BETWEEN 2 AND 4
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS stq,
                            max(CASE WHEN event_type = 'view'
                                     AND chain_valid
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS stv
                     FROM s4),
              s6 AS (SELECT *,
                            max(CASE WHEN event_type = 'purchase'
                                     AND stq IS NOT NULL
                                     AND us - stq <= 28800000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st2q,
                            max(CASE WHEN event_type = 'purchase'
                                     AND stv IS NOT NULL
                                     AND us - stv <= 28800000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st2plus
                     FROM s5)
         SELECT count(DISTINCT user_id) AS n_users,
                count(DISTINCT CASE WHEN stq IS NOT NULL
                                    THEN user_id END) AS n_quant_reach,
                count(DISTINCT CASE WHEN st2q IS NOT NULL
                                    THEN user_id END)
                  AS n_purchase_quant,
                count(DISTINCT CASE WHEN st2plus IS NOT NULL
                                    THEN user_id END)
                  AS n_purchase_plus,
                count(CASE WHEN event_type = 'view' AND chain_valid
                           AND pos > 4 THEN 1 END) AS n_views_beyond_4
         FROM s6""",
    "window_pattern_kleene" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
              s0 AS (SELECT *,
                            max(CASE WHEN event_type = 'signup'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st0,
                            max(CASE WHEN event_type = 'view'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pv
                     FROM e),
              s1 AS (SELECT *,
                            (event_type = 'view' AND
                             (pv IS NULL OR us - pv > 28800000000))
                              AS head
                     FROM s0),
              s2 AS (SELECT *,
                            sum(CASE WHEN head THEN 1 ELSE 0 END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cid
                     FROM s1),
              s3 AS (SELECT *,
                            min(CASE WHEN head THEN us END)
                              OVER (PARTITION BY user_id, cid)
                              AS chain_start,
                            min(CASE WHEN head
                                     THEN coalesce(st0, -1) END)
                              OVER (PARTITION BY user_id, cid)
                              AS head_st0
                     FROM s2),
              s4 AS (SELECT *,
                            (head_st0 >= 0 AND
                             chain_start - head_st0 <= 43200000000)
                              AS chain_valid
                     FROM s3),
              s5 AS (SELECT *,
                            max(CASE WHEN event_type = 'view'
                                     AND chain_valid
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS stv
                     FROM s4),
              s6 AS (SELECT *,
                            max(CASE WHEN event_type = 'purchase'
                                     AND stv IS NOT NULL
                                     AND us - stv <= 28800000000
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st2
                     FROM s5)
         SELECT count(DISTINCT user_id) AS n_users,
                count(DISTINCT CASE WHEN st0 IS NOT NULL
                                    THEN user_id END) AS n_signup,
                count(DISTINCT CASE WHEN head
                                    THEN CAST(user_id AS VARCHAR)
                                      || ':' || CAST(cid AS VARCHAR)
                               END) AS n_chains,
                count(DISTINCT CASE WHEN head AND chain_valid
                                    THEN CAST(user_id AS VARCHAR)
                                      || ':' || CAST(cid AS VARCHAR)
                               END) AS n_valid_chains,
                count(DISTINCT CASE WHEN stv IS NOT NULL
                                    THEN user_id END) AS n_chain_users,
                count(DISTINCT CASE WHEN st2 IS NOT NULL
                                    THEN user_id END) AS n_purchase
         FROM s6""",
    "window_pattern_negation" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_us(ts) AS us
                    FROM events),
              s0 AS (SELECT *,
                            max(CASE WHEN event_type = 'signup'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS st0,
                            max(CASE WHEN event_type = 'click'
                                     THEN us END)
                              OVER (PARTITION BY user_id
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS lastc
                     FROM e),
              s1 AS (SELECT *,
                            (event_type = 'purchase'
                             AND st0 IS NOT NULL
                             AND us - st0 <= 86400000000) AS in_deadline
                     FROM s0),
              s2 AS (SELECT *,
                            (in_deadline AND
                             (lastc IS NULL OR lastc < st0)) AS pure
                     FROM s1)
         SELECT count(DISTINCT user_id) AS n_users,
                count(DISTINCT CASE WHEN st0 IS NOT NULL
                                    THEN user_id END) AS n_signup,
                count(CASE WHEN in_deadline THEN 1 END)
                  AS n_deadline_purchases,
                count(CASE WHEN pure THEN 1 END) AS n_pure_purchases,
                count(CASE WHEN in_deadline AND NOT pure THEN 1 END)
                  AS n_tainted_purchases
         FROM s2""",
    "sample_time_decay" ->
      """WITH op AS (SELECT o_orderkey,
                            CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                            year(o_orderdate) AS yr
                     FROM orders),
              hz AS (SELECT max(yr) AS hmax FROM op),
              k AS (SELECT yr, hmax - yr AS age, price,
                           CAST(list_aggregate(list_transform(range(1, 13),
                             j -> (strpos('0123456789abcdef',
                                    substr(md5(CAST(o_orderkey AS VARCHAR)),
                                           CAST(j AS INT), 1)) - 1)
                                  * pow(16, 12 - j)), 'sum') AS BIGINT)
                             < (281474976710656 >> CAST(hmax - yr AS INT))
                             AS keep
                    FROM op CROSS JOIN hz)
         SELECT CAST(yr AS BIGINT) AS yr, CAST(age AS BIGINT) AS age,
                count(*) AS n_orders,
                CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept,
                floor(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                           AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) * 10000.0) / 10000
                  AS keep_rate,
                floor(CAST(sum(price) AS DOUBLE) * 10000.0) / 10000
                  AS raw_revenue,
                floor(CAST(sum(CASE WHEN keep THEN price
                                    ELSE CAST(0 AS DECIMAL(18,2)) END)
                           AS DOUBLE) * 10000.0) / 10000 AS kept_revenue
         FROM k GROUP BY yr, age ORDER BY yr""",
    "analytics_cuped" ->
      """WITH per AS (SELECT o_custkey,
                             sum(CASE WHEN o_orderdate < '1998-01-01'
                                      THEN CAST(o_totalprice
                                                AS DECIMAL(18,2))
                                      ELSE CAST(0 AS DECIMAL(18,2)) END)
                               AS xr,
                             sum(CASE WHEN o_orderdate >= '1998-01-01'
                                      THEN CAST(o_totalprice
                                                AS DECIMAL(18,2))
                                      ELSE CAST(0 AS DECIMAL(18,2)) END)
                               AS yr
                      FROM orders GROUP BY o_custkey),
              units AS (SELECT c_custkey,
                               CAST(coalesce(xr, 0) AS DECIMAL(18,2))
                                 AS x,
                               CAST(coalesce(yr, 0) AS DECIMAL(18,2))
                                 AS y,
                               CAST((strpos('0123456789abcdef',
                                      substr(md5(CAST(c_custkey
                                                      AS VARCHAR)), 1, 1))
                                     - 1) % 2 AS BIGINT) AS arm
                        FROM customer
                        LEFT JOIN per ON c_custkey = o_custkey),
              uk AS (SELECT arm, x, y,
                            CAST(x AS DOUBLE) / 1000.0 AS xk,
                            CAST(y AS DOUBLE) / 1000.0 AS ykq
                     FROM units),
              pool AS (SELECT count(*) AS n,
                              sum(CAST(CAST(floor(xk * 10000.0)
                                       AS BIGINT) AS DECIMAL(38,0)))
                                AS sx4,
                              sum(CAST(CAST(floor(ykq * 10000.0)
                                       AS BIGINT) AS DECIMAL(38,0)))
                                AS sy4,
                              sum(CAST(CAST(floor(xk * xk * 10000.0)
                                       AS BIGINT) AS DECIMAL(38,0)))
                                AS sxx4,
                              sum(CAST(CAST(floor(xk * ykq * 10000.0)
                                       AS BIGINT) AS DECIMAL(38,0)))
                                AS sxy4
                       FROM uk),
              adj AS (SELECT arm, y,
                             CAST(y AS DOUBLE)
                             - ((CAST(sxy4 AS DOUBLE) / 10000.0
                                 - (CAST(sx4 AS DOUBLE) / 10000.0)
                                   * (CAST(sy4 AS DOUBLE) / 10000.0)
                                   / CAST(n AS DOUBLE))
                                / (CAST(sxx4 AS DOUBLE) / 10000.0
                                   - (CAST(sx4 AS DOUBLE) / 10000.0)
                                     * (CAST(sx4 AS DOUBLE) / 10000.0)
                                     / CAST(n AS DOUBLE)))
                               * (CAST(x AS DOUBLE)
                                  - CAST(sx4 AS DOUBLE) / 10000.0
                                    / CAST(n AS DOUBLE) * 1000.0)
                               AS yadj
                      FROM uk CROSS JOIN pool),
              ag AS (SELECT arm, count(*) AS n_units,
                            sum(CAST(y AS DECIMAL(38,4))) AS asy,
                            sum(CAST(CAST(floor(yadj * 10000.0)
                                  AS BIGINT) AS DECIMAL(38,0))) AS sa4,
                            sum(CAST(CAST(floor((CAST(y AS DOUBLE) / 1000.0)
                                  * (CAST(y AS DOUBLE) / 1000.0)
                                  * 10000.0) AS BIGINT) AS DECIMAL(38,0)))
                              AS s2y,
                            sum(CAST(CAST(floor((yadj / 1000.0)
                                  * (yadj / 1000.0)
                                  * 10000.0) AS BIGINT) AS DECIMAL(38,0)))
                              AS s2a
                     FROM adj GROUP BY arm),
              fin AS (SELECT arm, n_units,
                             CAST(n_units AS DOUBLE) AS nd,
                             CAST(asy AS DOUBLE) AS asyd,
                             CAST(sa4 AS DOUBLE) AS sa4d,
                             CAST(s2y AS DOUBLE) AS s2yd,
                             CAST(s2a AS DOUBLE) AS s2ad
                      FROM ag),
              vv AS (SELECT arm, n_units, nd, asyd, sa4d,
                            floor((s2yd / 10000.0
                                   - (asyd / 1000.0) * (asyd / 1000.0)
                                     / nd)
                                  / (nd - 1.0) * 10000.0) / 10000
                              AS var_y_k2,
                            floor((s2ad / 10000.0
                                   - (sa4d / 10000.0 / 1000.0)
                                     * (sa4d / 10000.0 / 1000.0) / nd)
                                  / (nd - 1.0) * 10000.0) / 10000
                              AS var_y_adj_k2
                     FROM fin)
         SELECT arm, n_units,
                floor(asyd / nd * 10000.0) / 10000 AS mean_y,
                floor(sa4d / 10000.0 / nd * 10000.0) / 10000
                  AS mean_y_adj,
                var_y_k2, var_y_adj_k2,
                floor((1.0 - var_y_adj_k2 / var_y_k2) * 10000.0)
                  / 10000 AS var_reduction
         FROM vv ORDER BY arm""",
    "sample_raking_ipf" ->
      """WITH cells AS (SELECT lang, source, count(*) AS n
                        FROM documents GROUP BY lang, source),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                             count(DISTINCT lang) AS ll,
                             count(DISTINCT source) AS ss
                      FROM cells),
              w0 AS (SELECT lang, source, n, nn, ll, ss,
                            CAST(1.0 AS DOUBLE) AS w
                     FROM cells CROSS JOIN tot),
              l1 AS (SELECT lang AS lg,
                            sum(CAST(w * n AS DECIMAL(28,10))) AS cl
                     FROM w0 GROUP BY lang),
              wa1 AS (SELECT lang, source, n, nn, ll, ss,
                             w * (CAST(nn AS DOUBLE) / CAST(ll AS DOUBLE))
                               / CAST(cl AS DOUBLE) AS w
                      FROM w0 JOIN l1 ON lang = lg),
              s1 AS (SELECT source AS sc,
                            sum(CAST(w * n AS DECIMAL(28,10))) AS cs
                     FROM wa1 GROUP BY source),
              w1 AS (SELECT lang, source, n, nn, ll, ss,
                            w * (CAST(nn AS DOUBLE) / CAST(ss AS DOUBLE))
                              / CAST(cs AS DOUBLE) AS w
                     FROM wa1 JOIN s1 ON source = sc),
              l2 AS (SELECT lang AS lg,
                            sum(CAST(w * n AS DECIMAL(28,10))) AS cl
                     FROM w1 GROUP BY lang),
              wa2 AS (SELECT lang, source, n, nn, ll, ss,
                             w * (CAST(nn AS DOUBLE) / CAST(ll AS DOUBLE))
                               / CAST(cl AS DOUBLE) AS w
                      FROM w1 JOIN l2 ON lang = lg),
              s2 AS (SELECT source AS sc,
                            sum(CAST(w * n AS DECIMAL(28,10))) AS cs
                     FROM wa2 GROUP BY source),
              w2 AS (SELECT lang, source, n, nn, ll, ss,
                            w * (CAST(nn AS DOUBLE) / CAST(ss AS DOUBLE))
                              / CAST(cs AS DOUBLE) AS w
                     FROM wa2 JOIN s2 ON source = sc),
              l3 AS (SELECT lang AS lg,
                            sum(CAST(w * n AS DECIMAL(28,10))) AS cl
                     FROM w2 GROUP BY lang),
              wa3 AS (SELECT lang, source, n, nn, ll, ss,
                             w * (CAST(nn AS DOUBLE) / CAST(ll AS DOUBLE))
                               / CAST(cl AS DOUBLE) AS w
                      FROM w2 JOIN l3 ON lang = lg),
              s3 AS (SELECT source AS sc,
                            sum(CAST(w * n AS DECIMAL(28,10))) AS cs
                     FROM wa3 GROUP BY source),
              w3 AS (SELECT lang, source, n, nn, ll, ss,
                            w * (CAST(nn AS DOUBLE) / CAST(ss AS DOUBLE))
                              / CAST(cs AS DOUBLE) AS w
                     FROM wa3 JOIN s3 ON source = sc)
         SELECT lang, source, n AS n_docs,
                floor(w * 1000000.0) / 1000000 AS w_final,
                floor(w * CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
                      * 1000000.0) / 1000000 AS w_share
         FROM w3 ORDER BY lang, source""",
    "text_bm25_retrieval" ->
      """WITH tok AS (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS w
                     FROM documents),
              tf AS (SELECT doc_id, w, count(*) AS tf
                     FROM tok GROUP BY doc_id, w),
              dl AS (SELECT doc_id, count(*) AS dl
                     FROM tok GROUP BY doc_id),
              cand AS (SELECT * FROM tf WHERE doc_id % 5 = 0),
              navg AS (SELECT count(*) AS nc,
                              CAST(sum(dl) AS DOUBLE)
                                / CAST(count(*) AS DOUBLE) AS avgdl
                       FROM (SELECT DISTINCT c.doc_id FROM cand c)
                       JOIN dl USING (doc_id)),
              dfs AS (SELECT w, count(*) AS df FROM cand GROUP BY w),
              rare AS (SELECT w FROM dfs ORDER BY df, w LIMIT 8),
              dfk AS (SELECT w,
                             CAST(ln(1.0 + (CAST(nc - df AS DOUBLE)
                                            + 0.5)
                                          / (CAST(df AS DOUBLE) + 0.5))
                                  AS DECIMAL(28,10)) AS idf,
                             avgdl
                      FROM dfs CROSS JOIN navg
                      WHERE df * 10 <= nc * 3
                         OR w IN (SELECT w FROM rare)),
              probes AS (SELECT doc_id AS pid, w FROM tf
                         WHERE doc_id % 97 = 0),
              sc AS (SELECT pid, c.doc_id AS cid,
                            floor(CAST(sum(
                              CAST(CAST(idf AS DOUBLE)
                                   * (CAST(tf AS DOUBLE) * 2.2)
                                   / (CAST(tf AS DOUBLE)
                                      + 1.2 * (0.25
                                               + 0.75 * CAST(dl AS DOUBLE)
                                                 / avgdl))
                                   AS DECIMAL(28,10))) AS DOUBLE)
                              * 10000.0) / 10000 AS bm25
                     FROM cand c
                     JOIN dfk USING (w)
                     JOIN probes USING (w)
                     JOIN dl ON dl.doc_id = c.doc_id
                     WHERE pid <> c.doc_id
                     GROUP BY pid, c.doc_id),
              rk AS (SELECT *, row_number() OVER (PARTITION BY pid
                            ORDER BY bm25 DESC, cid) AS rank
                     FROM sc)
         SELECT pid, CAST(rank AS BIGINT) AS rank, cid, bm25
         FROM rk WHERE rank <= 3 ORDER BY pid, rank""",
    "sim_hybrid_retrieval" ->
      """WITH tok AS (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS w
                     FROM documents),
              tf AS (SELECT doc_id, w, count(*) AS tf
                     FROM tok GROUP BY doc_id, w),
              dl AS (SELECT doc_id, count(*) AS dl
                     FROM tok GROUP BY doc_id),
              cand AS (SELECT * FROM tf WHERE doc_id % 5 = 0),
              navg AS (SELECT count(*) AS nc,
                              CAST(sum(dl) AS DOUBLE)
                                / CAST(count(*) AS DOUBLE) AS avgdl
                       FROM (SELECT DISTINCT c.doc_id FROM cand c)
                       JOIN dl USING (doc_id)),
              dfs AS (SELECT w, count(*) AS df FROM cand GROUP BY w),
              rare AS (SELECT w FROM dfs ORDER BY df, w LIMIT 8),
              dfk AS (SELECT w,
                             CAST(ln(1.0 + (CAST(nc - df AS DOUBLE)
                                            + 0.5)
                                          / (CAST(df AS DOUBLE) + 0.5))
                                  AS DECIMAL(28,10)) AS idf,
                             avgdl
                      FROM dfs CROSS JOIN navg
                      WHERE df * 10 <= nc * 3
                         OR w IN (SELECT w FROM rare)),
              probes AS (SELECT doc_id AS pid, w FROM tf
                         WHERE doc_id % 97 = 0),
              scb AS (SELECT pid, c.doc_id AS cid,
                             floor(CAST(sum(
                               CAST(CAST(idf AS DOUBLE)
                                    * (CAST(tf AS DOUBLE) * 2.2)
                                    / (CAST(tf AS DOUBLE)
                                       + 1.2 * (0.25
                                                + 0.75
                                                  * CAST(dl AS DOUBLE)
                                                  / avgdl))
                                    AS DECIMAL(28,10))) AS DOUBLE)
                               * 10000.0) / 10000 AS bm25
                      FROM cand c
                      JOIN dfk USING (w)
                      JOIN probes USING (w)
                      JOIN dl ON dl.doc_id = c.doc_id
                      WHERE pid <> c.doc_id
                      GROUP BY pid, c.doc_id),
              fb AS (SELECT pid AS bpid, cid AS bcid, rb FROM
                       (SELECT *, row_number() OVER (PARTITION BY pid
                               ORDER BY bm25 DESC, cid) AS rb
                        FROM scb) WHERE rb <= 10),
              emb AS (SELECT doc_id,
                             (CAST(strpos('0123456789abcdef',
                                     substr(md5(w), 1, 1)) - 1
                                   AS BIGINT)) * 16
                             + (CAST(strpos('0123456789abcdef',
                                      substr(md5(w), 2, 1)) - 1
                                    AS BIGINT)) AS dim,
                             count(*) AS c
                      FROM tok GROUP BY doc_id, dim),
              ca AS (SELECT * FROM emb WHERE doc_id % 5 = 0),
              pa AS (SELECT * FROM emb WHERE doc_id % 97 = 0),
              ncc AS (SELECT count(DISTINCT doc_id) AS nc FROM ca),
              dimdf AS (SELECT dim, count(*) AS df FROM ca GROUP BY dim),
              keep AS (SELECT dim FROM dimdf CROSS JOIN ncc
                       WHERE df * 10 <= nc * 3
                          OR dim IN (SELECT dim FROM dimdf
                                     ORDER BY df, dim LIMIT 8)),
              pp AS (SELECT pa.doc_id AS pid, pa.dim, pa.c AS pc
                     FROM pa JOIN keep USING (dim)),
              cc AS (SELECT ca.* FROM ca JOIN keep USING (dim)),
              pn AS (SELECT pid AS pnid,
                            sqrt(CAST(sum(pc * pc) AS DOUBLE)) AS pn
                     FROM pp GROUP BY pid),
              cn AS (SELECT doc_id AS cnid,
                            sqrt(CAST(sum(c * c) AS DOUBLE)) AS cn
                     FROM cc GROUP BY doc_id),
              dots AS (SELECT pid, cc.doc_id AS cid,
                              CAST(sum(pc * cc.c) AS BIGINT) AS dot
                       FROM cc JOIN pp USING (dim)
                       WHERE pid <> cc.doc_id
                       GROUP BY pid, cc.doc_id),
              scc AS (SELECT pid, cid,
                             floor(CAST(dot AS DOUBLE) / (pn * cn)
                                   * 10000.0) / 10000 AS cos
                      FROM dots JOIN pn ON pid = pnid
                           JOIN cn ON cid = cnid),
              fc AS (SELECT pid AS cpid, cid AS ccid, rc FROM
                       (SELECT *, row_number() OVER (PARTITION BY pid
                               ORDER BY cos DESC, cid) AS rc
                        FROM scc) WHERE rc <= 10),
              fused AS (SELECT coalesce(bpid, cpid) AS pid,
                               coalesce(bcid, ccid) AS cid, rb, rc
                        FROM fb FULL OUTER JOIN fc
                          ON bpid = cpid AND bcid = ccid),
              rr AS (SELECT pid, cid, rb, rc,
                            floor((coalesce(1.0
                                     / (60.0 + CAST(rb AS DOUBLE)), 0.0)
                                   + coalesce(1.0
                                     / (60.0 + CAST(rc AS DOUBLE)), 0.0))
                                  * 1000000.0) / 1000000 AS rrf
                     FROM fused),
              fr AS (SELECT *, row_number() OVER (PARTITION BY pid
                            ORDER BY rrf DESC, cid) AS rank
                     FROM rr)
         SELECT pid, CAST(rank AS BIGINT) AS rank, cid,
                CAST(rb AS BIGINT) AS rank_bm25,
                CAST(rc AS BIGINT) AS rank_cos, rrf
         FROM fr WHERE rank <= 5 ORDER BY pid, rank""",
    "analytics_diff_in_diff" ->
      """WITH per AS (SELECT o_custkey,
                             sum(CASE WHEN o_orderdate < '1998-01-01'
                                      THEN CAST(o_totalprice
                                                AS DECIMAL(18,2))
                                      ELSE CAST(0 AS DECIMAL(18,2)) END)
                               AS xr,
                             sum(CASE WHEN o_orderdate >= '1998-01-01'
                                      THEN CAST(o_totalprice
                                                AS DECIMAL(18,2))
                                      ELSE CAST(0 AS DECIMAL(18,2)) END)
                               AS yr
                      FROM orders GROUP BY o_custkey),
              units AS (SELECT c_custkey,
                               coalesce(xr, 0) AS x,
                               coalesce(yr, 0) AS y,
                               (strpos('0123456789abcdef',
                                 substr(md5(CAST(c_custkey AS VARCHAR)),
                                        1, 1)) - 1) % 2 AS arm
                        FROM customer
                        LEFT JOIN per ON c_custkey = o_custkey),
              ag AS (SELECT
                       CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_t,
                       CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_c,
                       sum(CASE WHEN arm = 1
                                THEN CAST(x AS DECIMAL(38,4))
                                ELSE CAST(0 AS DECIMAL(38,4)) END)
                         AS sxt,
                       sum(CASE WHEN arm = 0
                                THEN CAST(x AS DECIMAL(38,4))
                                ELSE CAST(0 AS DECIMAL(38,4)) END)
                         AS sxc,
                       sum(CASE WHEN arm = 1
                                THEN CAST(y AS DECIMAL(38,4))
                                ELSE CAST(0 AS DECIMAL(38,4)) END)
                         AS syt,
                       sum(CASE WHEN arm = 0
                                THEN CAST(y AS DECIMAL(38,4))
                                ELSE CAST(0 AS DECIMAL(38,4)) END)
                         AS syc
                     FROM units),
              mm AS (SELECT n_t, n_c,
                            floor(CAST(sxt AS DOUBLE)
                                  / CAST(n_t AS DOUBLE) * 10000.0)
                              / 10000 AS pre_t,
                            floor(CAST(sxc AS DOUBLE)
                                  / CAST(n_c AS DOUBLE) * 10000.0)
                              / 10000 AS pre_c,
                            floor(CAST(syt AS DOUBLE)
                                  / CAST(n_t AS DOUBLE) * 10000.0)
                              / 10000 AS post_t,
                            floor(CAST(syc AS DOUBLE)
                                  / CAST(n_c AS DOUBLE) * 10000.0)
                              / 10000 AS post_c
                     FROM ag),
              tr AS (SELECT *,
                            floor((post_t - pre_t) * 10000.0) / 10000
                              AS trend_t,
                            floor((post_c - pre_c) * 10000.0) / 10000
                              AS trend_c
                     FROM mm)
         SELECT n_t, n_c, pre_t, pre_c, post_t, post_c, trend_t,
                trend_c,
                floor((trend_t - trend_c) * 10000.0) / 10000 AS did
         FROM tr""",
    "analytics_attribution_shapley" ->
      """WITH fp AS (SELECT user_id, min(ts) AS pts
                     FROM events WHERE event_type = 'purchase'
                     GROUP BY user_id),
              bits AS (SELECT DISTINCT e.user_id,
                              CASE e.event_type
                                WHEN 'click' THEN 1 WHEN 'error' THEN 2
                                WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                                ELSE 0 END AS b
                       FROM events e JOIN fp USING (user_id)
                       WHERE e.ts < fp.pts
                         AND e.event_type <> 'purchase'),
              um AS (SELECT fp.user_id,
                            coalesce(bm.mask, 0) AS mask
                     FROM fp LEFT JOIN
                       (SELECT user_id, sum(b) AS mask
                        FROM bits WHERE b > 0 GROUP BY user_id) bm
                       USING (user_id)),
              mc AS (SELECT mask, count(*) AS cnt
                     FROM um GROUP BY mask),
              sp AS (SELECT unnest(range(0, 16)) AS cs),
              v AS (SELECT cs,
                           CAST(coalesce(sum(cnt), 0) AS BIGINT) AS v
                    FROM sp LEFT JOIN mc ON (mask & cs) = mask
                    GROUP BY cs),
              ch AS (SELECT ['click','error','signup','view'][i + 1]
                              AS channel,
                            CAST(1 << i AS BIGINT) AS cb
                     FROM (SELECT unnest(range(0, 4)) AS i)),
              terms AS (SELECT channel, cb,
                               CASE (v0.cs & 1) + ((v0.cs >> 1) & 1)
                                    + ((v0.cs >> 2) & 1)
                                    + ((v0.cs >> 3) & 1)
                                 WHEN 0 THEN 6 WHEN 1 THEN 2
                                 WHEN 2 THEN 2 ELSE 6 END AS w24,
                               v1.v - v0.v AS dv
                        FROM ch
                        JOIN v v0 ON (v0.cs & cb) = 0
                        JOIN v v1 ON v1.cs = v0.cs + cb),
              phi AS (SELECT channel,
                             CAST(sum(w24 * dv) AS BIGINT) AS phi24
                      FROM terms GROUP BY channel),
              ne AS (SELECT CAST(sum(CASE WHEN mask <> 0 THEN cnt
                                          ELSE 0 END) AS BIGINT)
                              AS n_explained
                     FROM mc)
         SELECT channel, phi24,
                floor(CAST(phi24 AS DOUBLE) / 24.0 * 10000.0) / 10000
                  AS phi,
                floor(CAST(phi24 AS DOUBLE) / 24.0
                      / CAST(nullif(n_explained, 0) AS DOUBLE)
                      * 10000.0) / 10000
                  AS share_of_explained
         FROM phi CROSS JOIN ne ORDER BY channel""",
    "sample_pps_systematic" ->
      """WITH u AS (SELECT o_custkey,
                           CAST(sum(CAST(o_totalprice
                                         AS DECIMAL(18,2))) * 100
                                AS BIGINT) AS cents
                    FROM orders GROUP BY o_custkey),
              c AS (SELECT o_custkey, cents,
                           CAST(sum(cents) OVER (ORDER BY o_custkey)
                                AS BIGINT) AS csum
                    FROM u),
              t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM u),
              sel AS (SELECT o_custkey, cents,
                             (CAST(csum AS HUGEINT) * 100) // total
                             - (CAST(csum - cents AS HUGEINT) * 100)
                               // total AS crossings
                      FROM c CROSS JOIN t)
         SELECT o_custkey, cents, CAST(crossings AS BIGINT) AS crossings
         FROM sel WHERE crossings > 0 ORDER BY o_custkey""",
    "graph_local_clustering" ->
      """WITH ps AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                     FROM lineitem WHERE l_partkey % 10 = 0),
              ed AS (SELECT DISTINCT a.pk AS u, b.pk AS v
                     FROM ps a JOIN ps b
                       ON a.ok = b.ok AND a.pk < b.pk),
              tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                      FROM ed e1
                      JOIN ed e2 ON e1.v = e2.u
                      JOIN ed e3 ON e1.u = e3.u AND e2.v = e3.v),
              pn AS (SELECT node, count(*) AS t FROM (
                       SELECT a AS node FROM tri
                       UNION ALL SELECT b FROM tri
                       UNION ALL SELECT c FROM tri)
                     GROUP BY node),
              dg AS (SELECT node, count(*) AS deg FROM (
                       SELECT u AS node FROM ed
                       UNION ALL SELECT v FROM ed)
                     GROUP BY node),
              lc AS (SELECT dg.node,
                            floor(2.0 * CAST(coalesce(t, 0) AS DOUBLE)
                                  / CAST(deg * (deg - 1) AS DOUBLE)
                                  * 10000.0) / 10000 AS lcc
                     FROM dg LEFT JOIN pn ON dg.node = pn.node
                     WHERE deg >= 2)
         SELECT CAST(least(floor(lcc * 10), 9) AS BIGINT) AS bucket,
                count(*) AS n_nodes,
                floor(CAST(sum(CAST(lcc AS DECIMAL(28,10))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) * 10000.0) / 10000
                  AS mean_lcc
         FROM lc GROUP BY bucket ORDER BY bucket""",
    "window_pattern_vshape" ->
      """WITH daily AS (SELECT c_mktsegment AS seg,
                              CAST(o_orderdate AS DATE) AS day,
                              CAST(floor(
                                CAST(sum(CAST(o_totalprice
                                              AS DECIMAL(18,2)))
                                     AS DOUBLE)
                                / CAST(count(*) AS DOUBLE) * 10000.0)
                                AS BIGINT) AS v4
                       FROM orders
                       JOIN customer ON o_custkey = c_custkey
                       GROUP BY seg, day),
              lagd AS (SELECT seg, day, v4,
                              lag(v4) OVER w AS pv,
                              lead(v4) OVER w AS nv
                       FROM daily
                       WINDOW w AS (PARTITION BY seg ORDER BY day)),
              f AS (SELECT seg,
                           (pv IS NOT NULL AND nv IS NOT NULL
                            AND pv * 100 >= v4 * 105
                            AND nv * 100 >= v4 * 105) AS is_v,
                           CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                                 AND pv * 100 >= v4 * 105
                                 AND nv * 100 >= v4 * 105
                                THEN least(pv, nv) - v4
                                ELSE 0 END AS depth
                    FROM lagd)
         SELECT seg, count(*) AS n_days,
                CAST(sum(CASE WHEN is_v THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_vshapes,
                CAST(max(depth) AS BIGINT) AS max_depth4
         FROM f GROUP BY seg ORDER BY seg""",
    "timeseries_sax_words" ->
      """WITH daily AS (SELECT c_mktsegment AS seg,
                              CAST(o_orderdate AS DATE) AS day,
                              CAST(floor(
                                CAST(sum(CAST(o_totalprice
                                              AS DECIMAL(18,2)))
                                     AS DOUBLE)
                                / CAST(count(*) AS DOUBLE) * 10000.0)
                                AS BIGINT) AS v4
                       FROM orders
                       JOIN customer ON o_custkey = c_custkey
                       GROUP BY seg, day),
              mom AS (SELECT seg, count(*) AS n,
                             CAST(sum(v4) AS HUGEINT) AS sv,
                             sum(CAST(v4 AS HUGEINT) * v4) AS sq
                      FROM daily GROUP BY seg),
              z AS (SELECT daily.seg, day,
                           CAST(n AS HUGEINT) * v4 - sv AS l,
                           CAST(n AS HUGEINT) * sq - sv * sv AS dd
                    FROM daily JOIN mom ON daily.seg = mom.seg),
              sym AS (SELECT seg, day,
                             CASE WHEN l < 0 THEN
                               CASE WHEN l * l * 100000000 >
                                         45495025 * dd
                                    THEN 'a' ELSE 'b' END
                             ELSE
                               CASE WHEN l > 0 AND l * l * 100000000 >
                                         45495025 * dd
                                    THEN 'd' ELSE 'c' END
                             END AS sym
                      FROM z),
              w AS (SELECT seg,
                           sym || lead(sym, 1) OVER win
                               || lead(sym, 2) OVER win AS word
                    FROM sym
                    WINDOW win AS (PARTITION BY seg ORDER BY day)),
              c AS (SELECT seg, word, count(*) AS n_windows
                    FROM w WHERE word IS NOT NULL
                    GROUP BY seg, word),
              t AS (SELECT seg, sum(n_windows) AS total
                    FROM c GROUP BY seg)
         SELECT seg, word, n_windows,
                floor(CAST(n_windows AS DOUBLE)
                      / CAST(total AS DOUBLE) * 10000.0) / 10000
                  AS share
         FROM c JOIN t USING (seg) ORDER BY seg, word""",
    "text_keyword_rake" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
              tok AS (SELECT doc_id, i AS p, ws[i] AS w
                      FROM (SELECT doc_id, ws,
                                   unnest(range(1, len(ws) + 1)) AS i
                            FROM ws)),
              st AS (SELECT doc_id, p, w,
                            w IN ('a', 'the') AS isstop,
                            sum(CASE WHEN w IN ('a', 'the')
                                     THEN 1 ELSE 0 END)
                              OVER (PARTITION BY doc_id ORDER BY p)
                              AS pid
                     FROM tok),
              ph AS (SELECT doc_id, pid, p, w FROM st
                     WHERE NOT isstop AND w <> ''),
              plen AS (SELECT doc_id, pid, count(*) AS plen
                       FROM ph GROUP BY doc_id, pid),
              t2 AS (SELECT ph.doc_id, ph.pid, ph.p, ph.w, plen.plen
                     FROM ph JOIN plen USING (doc_id, pid)),
              wsc AS (SELECT w,
                             CAST(CAST(sum(plen) AS HUGEINT) * 10000
                                  // count(*) AS BIGINT) AS wscore4
                      FROM t2 GROUP BY w),
              pinst AS (SELECT doc_id, pid,
                               string_agg(w, ' ' ORDER BY p) AS phrase,
                               count(*) AS n_words,
                               CAST(sum(wscore4) AS BIGINT) AS score4
                        FROM t2 JOIN wsc USING (w)
                        GROUP BY doc_id, pid),
              agg AS (SELECT phrase,
                             CAST(max(n_words) AS BIGINT) AS n_words,
                             count(*) AS n_occ,
                             max(score4) AS score4
                      FROM pinst GROUP BY phrase)
         SELECT phrase, n_words, n_occ, score4
         FROM agg ORDER BY score4 DESC, phrase LIMIT 20""",
  )
}
