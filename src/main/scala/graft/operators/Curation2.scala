package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 curation operators — the three corpus-hygiene passes still
  * missing after r8 (VERDICT r8 "What's missing" #3 and the
  * training-pipeline mandate):
  *
  *   - `text_substring_dedup_chars`: CHARACTER-level exact substring
  *     dedup (Lee et al. 2022, "Deduplicating Training Data Makes
  *     Language Models Better") via winnowing fingerprints
  *     (Schleimer et al. 2003) — the granularity below the
  *     word-8-gram shingles of `text_span_dedup`, with an
  *     offset-independent detection guarantee above 59 chars.
  *   - `text_boilerplate_ngrams`: within-source document-frequency
  *     boilerplate detection (the RefinedWeb/CCNet repeated-template
  *     removal signal).
  *   - `feature_hashed_ngrams`: the hashing-trick feature map
  *     (Weinberger et al. 2009; the fastText input layer) over
  *     unigrams + bigrams.
  *
  * Oracle strategy follows DedupAdvanced: every hash is md5 over an
  * explicit string (byte-identical in DuckDB), bucket ids derive from
  * md5 hex prefixes via the conv ↔ strpos('0123456789abcdef',…)
  * twin, doubles are floor(x·10⁴)/10⁴, and every result ends in a
  * total ORDER BY.
  *
  * Scale notes (100 TB): all three shuffle only (key-hash, id) pairs —
  * document text never moves. Substring windows are ~len/stride rows
  * per doc with md5 applied BEFORE the shuffle; the duplicated-window
  * inverted index is an equi-self-count on the hash (skew-safe: a
  * hash bucket holds only byte-identical windows); boilerplate DF is
  * one (source, hash) aggregation; the hashing trick is bounded at
  * D=64 counters per doc — partial-aggregated map-side.
  */
object Curation2 {
  type Q = (SparkSession, String) => DataFrame

  /** char k-gram width / winnow window: winnowing (Schleimer et al.
    * 2003, "Winnowing: Local Algorithms for Document Fingerprinting")
    * guarantees any duplicated run ≥ WinL + WinW − 1 = 59 chars
    * shares a selected fingerprint HASH across its copies REGARDLESS
    * of byte offset — the content-defined selection a naive
    * stride-aligned window scheme lacks (a stride grid never lines up
    * across docs when the shared run sits at different offsets; the
    * spec's planted-duplicate test caught exactly that in the first
    * formulation of this key). */
  private val WinL = 40
  private val WinW = 20

  val queries: Map[String, Q] = Map(
    // Char-level exact substring dedup via winnowing fingerprints.
    // Every char position hashes its 40-char k-gram (md5); each
    // 20-position winnow window selects its (hash, pos)-minimum;
    // the DISTINCT selected minima are the doc's fingerprints —
    // ~len/20 of them, content-aligned. A fingerprint hash occurring
    // ≥ 2 times corpus-wide (across docs or repeated within one —
    // both are duplicated training text) marks a duplicated region,
    // and per-doc overlapping fingerprint k-grams merge into maximal
    // spans (gaps-and-islands) whose char mass is reported against
    // the doc length. Scale: the per-position hashing is
    // embarrassingly parallel AT THE SCAN (the price of char-grain
    // dedup — Lee et al.'s suffix arrays touch every position too);
    // the shuffle then moves only the ~len/20 selected fingerprints
    // (a w-fold reduction — winnowing's point), keyed by hash, and a
    // hash bucket holds only byte-identical k-grams (skew-safe).
    //
    // r13 shuffle fix (found by the new ShuffleAudit harness): the r9
    // formulation ran the winnow selection as a doc_id-partitioned
    // WINDOW over the exploded grams — which shuffled EVERY gram
    // (position + 32-char md5 ≈ 43× the corpus text, measured at
    // sf0.1: 60.98 MB shuffled for a 1.42 MB corpus) before throwing
    // 19/20 of them away, silently contradicting the scale note
    // above. Fix: repartition the DOCUMENTS by doc_id BEFORE the
    // explode — Generate preserves its child's hash partitioning, so
    // the winnow window's ClusteredDistribution(doc_id) is already
    // satisfied and needs only a LOCAL sort: the exchange carries
    // text rows (1× the corpus) instead of grams (43×), while the
    // md5 + window-min stay whole-stage-codegen'd (the pure-HOF
    // per-row rewrite was also tried: sub-MB shuffle but ~4× wall —
    // interpreted lambda evaluation lost more CPU than the shuffle
    // saved; recorded in PLANS.md). Curation2Spec pins the plan:
    // exactly one exchange upstream of the winnow window, at
    // document grain.
    "text_substring_dedup_chars" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .filter(col("len") >= WinL)
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("len"), explode(expr(
          s"""transform(sequence(1, len - $WinL + 1),
                p -> named_struct('p', p,
                                  'h', md5(substring(text, p, $WinL))))"""
        )).as("g"))
        .select(col("doc_id"), col("len"),
          col("g.p").as("p"), col("g.h").as("h"))
      // winnow: per start position the (h, p)-min of the next 20
      // grams (trailing windows truncate identically in the oracle);
      // DISTINCT minima = the fingerprint set. The fingerprint frame
      // feeds BOTH output branches (totals + dup islands), so the
      // winnowing subtree is computed twice — DELIBERATELY (r9 A/B:
      // recompute 2.5 s vs eager localCheckpoint 3.9 s at sf0.1; the
      // subtree is codegen'd CPU that parallelizes fully, while a
      // checkpoint pays serialization and breaks fusion).
      val fps = grams
        .withColumn("m", min(struct(col("h"), col("p"))).over(
          Window.partitionBy("doc_id").orderBy("p")
            .rowsBetween(0, WinW - 1)))
        .select(col("doc_id"), col("len"),
          col("m.h").as("h"), col("m.p").as("p"))
        .distinct()
      val marked = fps.withColumn("nd",
        count(lit(1)).over(Window.partitionBy("h")))
      val dups = marked.filter(col("nd") > 1)
      // merge overlapping/adjacent duplicated k-grams into islands
      val prevEnd = max(col("p") + lit(WinL - 1)).over(
        Window.partitionBy("doc_id").orderBy("p")
          .rowsBetween(Window.unboundedPreceding, -1))
      val isl = dups
        .withColumn("new_isl",
          when(prevEnd.isNull || col("p") > prevEnd, 1).otherwise(0))
        .withColumn("isl", sum(col("new_isl")).over(
          Window.partitionBy("doc_id").orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "isl")
        .agg((max(col("p") + lit(WinL - 1)) - min(col("p")) + 1)
          .as("span_chars"), count(lit(1)).as("n_fps"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup_spans"),
          sum(col("n_fps")).as("n_dup_fps"),
          sum(col("span_chars")).as("dup_chars"))
      marked.groupBy("doc_id", "len")
        .agg(count(lit(1)).as("n_fingerprints"))
        .join(isl, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_fingerprints"),
          coalesce(col("n_dup_fps"), lit(0L)).as("n_dup_fps"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
          (floor(coalesce(col("dup_chars"), lit(0L)) * 10000.0
            / col("len")) / 10000).as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // Within-source boilerplate: distinct word-3-grams per doc, then
    // the per-source document frequency of each 3-gram hash. A
    // 3-gram carried by ≥ 3 docs of one source is template text
    // (headers, navigation, legal footers in a real crawl). Reported
    // per source: corpus size, distinct/boilerplate 3-gram counts,
    // and the worst repeater. Only (source, md5) pairs shuffle.
    "text_boilerplate_ngrams" -> ((s, d) => {
      val docsrc = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
      val grams = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("source"), col("doc_id"), explode(expr(
          """array_distinct(zip_with(
               zip_with(slice(t, 1, size(t)-2), slice(t, 2, size(t)-2),
                        (a, b) -> concat(a, ' ', b)),
               slice(t, 3, size(t)-2),
               (ab, c) -> concat(ab, ' ', c)))"""
        )).as("g"))
        .select(col("source"), col("doc_id"), md5(col("g")).as("h"))
      val df = grams.groupBy("source", "h")
        .agg(count(lit(1)).as("df"))
      df.groupBy("source")
        .agg(count(lit(1)).as("n_distinct_3grams"),
          coalesce(sum(when(col("df") >= 3, 1L)), lit(0L))
            .as("n_boilerplate_3grams"),
          max(col("df")).as("max_df"))
        .join(docsrc, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_distinct_3grams"),
          col("n_boilerplate_3grams"), col("max_df"))
        .orderBy("source")
    }),

    // Duplicate-downweighting (r9): the SOFT alternative to dropping
    // exact duplicates — each doc weighs 1/cluster_size (clusters =
    // exact md5(text) groups, corpus-wide), so a 5-copy page
    // contributes one page of training mass spread over its copies
    // (the duplication-aware mixing used when upsampling curated
    // sources). Per source: raw vs effective token budgets and the
    // discount. Exactness: per-doc n_tok/cluster_size is one double
    // division (identical bits both engines) quantized to
    // DECIMAL(28,10) pre-sum — the order-independent sum pattern.
    // Only (md5, source) pairs shuffle.
    "sample_downweight_duplicates" -> ((s, d) => {
      val h = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), md5(col("text")).as("h"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val cs = h.groupBy("h").agg(count(lit(1)).as("csize"))
      h.join(cs, Seq("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_unique"),
          sum(col("n_tok")).as("raw_tokens"),
          (floor(sum((col("n_tok") / col("csize"))
            .cast("decimal(28,10)")).cast("double") * 10000.0) / 10000)
            .as("eff_tokens"))
        .withColumn("discount",
          floor((lit(1.0) - col("eff_tokens") / col("raw_tokens"))
            * 10000.0) / 10000)
        .orderBy("source")
    }),

    // Deterministic hash-rank reservoir (r9): a uniform k-per-group
    // sample with NO random state — rank docs by md5 of the doc id
    // and keep the k smallest per language. Mergeable by
    // construction (min-k of a union = min-k of per-shard min-ks —
    // the distributed-reservoir property), and Spark 4 plans the
    // rank filter as map-side + reduce-side WindowGroupLimit, so at
    // 100 TB each partition forwards at most k rows per group into
    // the shuffle (the window_rank_topk_per_group plan note).
    "sample_reservoir_hashrank" -> ((s, d) => {
      val ranked = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          md5(concat(lit("rsv:"), col("doc_id").cast("string"))).as("u"))
        .withColumn("r", row_number().over(
          Window.partitionBy("lang").orderBy(col("u"), col("doc_id"))))
        .filter(col("r") <= 20)
      ranked.select(col("lang"), col("r"), col("doc_id"))
        .orderBy("lang", "r")
    }),

    // Weighted sampling WITHOUT replacement (r13) — Efraimidis &
    // Spirakis 2006 ("Weighted random sampling with a reservoir")
    // via exponential clocks: each doc draws a deterministic uniform
    // u from the engine's md5 coin and keys itself with
    // −ln(u)/w (w = token count — the "sample long docs more" mix
    // knob); the k SMALLEST keys are exactly a weighted sample
    // without replacement. The weighted sibling of
    // `sample_reservoir_hashrank`: same no-random-state mergeability
    // (min-k of a union = min-k of per-shard min-ks), and Spark
    // plans the global top-k as TakeOrderedAndProject — each
    // partition forwards k rows, ONE scan of the corpus draws the
    // sample at 100 TB (pinned in Round13Spec). Determinism: the
    // (u48+1)/2^48 uniform, ln, the /w division, and the ·10¹²
    // floor-quantization are all identical IEEE doubles in both
    // engines (the text-LM ln precedent); ranking compares the
    // BIGINT quantile with doc_id tiebreak. Boundary safety (ADVICE
    // r13): a 1-ulp cross-engine ln() divergence perturbs the
    // quantile by ≤ |ln u|·2.3e-16/w·10¹² ≤ 3.6e-3, and Round13Spec
    // measures every fixture quantile's distance to its floor
    // boundary in perturbation-widths (≥10× clearance enforced;
    // observed ≫ that — boundary distance is ~U(0, 0.5)).
    "sample_weighted_reservoir" -> ((s, d) => {
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .filter(col("n_tok") >= 1)
        .withColumn("u48", expr(
          """CAST(conv(substring(md5(concat('wrs:',
                 CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"""))
        .withColumn("kq", expr(
          """CAST(floor(-ln((CAST(u48 AS DOUBLE) + 1.0)
                 / 281474976710656.0)
                 / CAST(n_tok AS DOUBLE) * 1e12) AS BIGINT)"""))
      keyed.orderBy(col("kq"), col("doc_id")).limit(25)
        .withColumn("rank", row_number().over(
          Window.partitionBy(lit(1)).orderBy(col("kq"), col("doc_id"))))
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          col("lang"), col("n_tok"), col("kq"))
        .orderBy("rank")
    }),

    // Hashing-trick features: unigrams + word-bigrams hash into D=64
    // buckets (first 2 md5 hex chars mod 64 — the conv↔strpos twin);
    // per sampled doc the bucket-count vector is summarized as
    // (nnz, argmax bucket with deterministic (count DESC, bucket ASC)
    // tie-break, its count, l2 norm). The full vector is D bounded
    // counters per doc — the map-side partial aggregation a 100 TB
    // featurization relies on; no vocabulary state exists at all
    // (that is the point of the trick).
    "feature_hashed_ngrams" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val feats = toks.select(col("doc_id"), explode(expr(
        """concat(t, zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),
                              (a, b) -> concat(a, ' ', b)))"""
      )).as("f"))
        .select(col("doc_id"),
          (expr("CAST(conv(substring(md5(f), 1, 2), 16, 10) AS BIGINT)")
            % 64).as("bucket"))
      val cnts = feats.groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"))
      val top = cnts.withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("cnt").desc, col("bucket"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("bucket").as("top_bucket"),
          col("cnt").as("top_cnt"))
      cnts.groupBy("doc_id")
        .agg(count(lit(1)).as("n_nz"),
          (floor(sqrt(sum(col("cnt") * col("cnt"))) * 10000.0) / 10000)
            .as("l2_norm"))
        .join(top, Seq("doc_id"))
        .select(col("doc_id"), col("n_nz"), col("top_bucket"),
          col("top_cnt"), col("l2_norm"))
        .orderBy("doc_id")
    }),

    // RAG corpus build end-to-end (r9): chunk → embed → retrieve as
    // ONE declared plan, composing three verified primitives —
    // sliding chunking (text_chunk_sliding geometry: 120/80),
    // hashing-trick embeddings (feature_hashed_ngrams family: D=256
    // dims, dim = first two md5 hex digits of the token ≈ one dim
    // per vocab word, so the vector is the token-distribution
    // signature) and top-3 retrieval. Retrieval runs as an INVERTED
    // INDEX join with STOP-DIM pruning: dims whose candidate-corpus
    // document frequency exceeds 30% are dropped from BOTH sides
    // before scoring (the stopword/idf cut every production sparse
    // retriever applies — ScaleSmoke measured the unpruned D=16
    // variant pairing every probe with every candidate, i.e. the
    // postings join degenerated to the dense cross join it's meant
    // to avoid; pruning cuts pairs 13× at sf0.01 and the cut is
    // df-proportional so it holds at any corpus size). Vectors stay
    // relational (chunk, dim, count) triples, probe postings and the
    // ≤256-row keep-list broadcast, the dim-keyed equi-join yields
    // only pairs sharing a KEPT (discriminative) dim, and the
    // integer dot product Σ c_p·c_c is EXACT pre-normalization — no
    // doubles until the final cosine division; norms are computed
    // over the pruned vectors (stop-dim removal is part of the
    // embedding, as stopword removal precedes indexing). A probe
    // whose every dim is a stop-dim retrieves nothing and drops out
    // — honest, visible behavior (4 of 19 probe chunks at sf0.01).
    // Probes = chunks of doc_id%97 docs, candidates = chunks of
    // doc_id%5 docs, other docs only.
    "pipeline_chunk_embed_e2e" -> ((s, d) => {
      val chunks = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .select(col("doc_id"), col("text"), explode(expr(
          """transform(sequence(0L, (greatest(len - 120, 0) + 79) div 80),
               i -> named_struct('i', i, 'p', cast(i * 80 + 1 as int)))"""
        )).as("c"))
        .select(col("doc_id"),
          concat(col("doc_id").cast("string"), lit("#"),
            col("c.i").cast("string")).as("cid"),
          expr("substring(text, c.p, 120)").as("chunk"))
      val emb = chunks
        .select(col("doc_id"), col("cid"),
          explode(split(col("chunk"), " ")).as("w"))
        .select(col("doc_id"), col("cid"),
          expr("CAST(conv(substring(md5(w), 1, 2), 16, 10) AS BIGINT)")
            .as("dim"))
        .groupBy("doc_id", "cid", "dim").agg(count(lit(1)).as("c"))
      // Consumers re-derive the chunk+tokenize+md5 subtree —
      // DELIBERATELY recomputed. A/B at sf0.1 (isolated, 3 reps):
      // recompute 5.7–6.8 s vs localCheckpoint 6.6–7.2 s — the
      // subtree is pure codegen'd CPU that parallelizes fully, and
      // the probe/cand branches prune it down (the checkpoint
      // materializes the FULL emb first and pays the RDD boundary).
      // Same verdict as the text_substring_dedup_chars A/B; the
      // kcore/CC exception is ITERATED reuse, which this plan
      // doesn't have.
      val probesAll = emb.filter(col("doc_id") % 97 === 0)
      val candsAll = emb.filter(col("doc_id") % 5 === 0)
      // stop-dim cut: candidate-corpus df per dim (one bounded
      // aggregate — ≤256 rows out), keep df ≤ 30% of candidate
      // chunks; exact integer comparison df·10 ≤ nc·3
      val nc = candsAll.agg(countDistinct(col("cid")).as("nc"))
      val keep = candsAll.groupBy("dim").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nc))
        .filter(col("df") * 10 <= col("nc") * 3)
        .select("dim")
      val probes = probesAll.join(broadcast(keep), Seq("dim"))
      val cands = candsAll.join(broadcast(keep), Seq("dim"))
      // per-side norms: the probe table is tiny → broadcast; the
      // candidate-norm join stays a ccid equi-join (corpus-sized —
      // broadcasting ALL chunk norms would not survive 100 TB)
      val pn = probes.groupBy(col("cid").as("pcid"))
        .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("pn"))
      val cn = cands.groupBy(col("cid").as("ccid"))
        .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("cn"))
      val dots = cands.as("c")
        .join(broadcast(probes.as("p")),
          col("p.dim") === col("c.dim") &&
            col("p.doc_id") =!= col("c.doc_id"))
        .groupBy(col("p.cid").as("pcid"), col("c.cid").as("ccid"))
        .agg(sum(col("p.c") * col("c.c")).as("dot"))
      val scored = dots
        .join(broadcast(pn), Seq("pcid"))
        .join(cn, Seq("ccid"))
        .withColumn("cos",
          floor((col("dot").cast("double") / (col("pn") * col("cn")))
            * 10000.0) / 10000)
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("pcid")
            .orderBy(col("cos").desc, col("ccid"))))
        .filter(col("rank") <= 3)
        .select(col("pcid"), col("rank"), col("ccid"), col("dot"),
          col("cos"))
        .orderBy("pcid", "rank")
    }),
  )

  val oracles: Map[String, String] = Map(
    "text_substring_dedup_chars" ->
      s"""WITH base AS (SELECT doc_id, text, length(text) AS len
                        FROM documents WHERE length(text) >= $WinL),
              pos AS (SELECT doc_id, text, len,
                             unnest(range(1, len - ${WinL - 2})) AS p
                      FROM base),
              g AS (SELECT doc_id, len, p,
                           md5(substr(text, CAST(p AS INT), $WinL)) AS h
                    FROM pos),
              sel AS (SELECT doc_id, len,
                             min(struct_pack(h := h, p := p))
                               OVER (PARTITION BY doc_id ORDER BY p
                                     ROWS BETWEEN CURRENT ROW
                                     AND ${WinW - 1} FOLLOWING) AS m
                      FROM g),
              fp AS (SELECT DISTINCT doc_id, len,
                            m.h AS h, m.p AS p
                     FROM sel),
              mk AS (SELECT doc_id, len, p,
                            count(*) OVER (PARTITION BY h) AS nd
                     FROM fp),
              dup AS (SELECT doc_id, p,
                             CASE WHEN p > coalesce(max(p + ${WinL - 1})
                               OVER (PARTITION BY doc_id ORDER BY p
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                               THEN 1 ELSE 0 END AS new_isl
                      FROM mk WHERE nd > 1),
              isl AS (SELECT doc_id, p,
                             sum(new_isl) OVER (PARTITION BY doc_id
                               ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS isl
                      FROM dup),
              sp AS (SELECT doc_id, isl,
                            max(p + ${WinL - 1}) - min(p) + 1 AS span_chars,
                            count(*) AS n_f
                     FROM isl GROUP BY doc_id, isl),
              agg AS (SELECT doc_id, count(*) AS n_dup_spans,
                             CAST(sum(n_f) AS BIGINT) AS n_dup_fps,
                             CAST(sum(span_chars) AS BIGINT) AS dup_chars
                      FROM sp GROUP BY doc_id),
              tot AS (SELECT doc_id, len, count(*) AS n_fingerprints
                      FROM mk GROUP BY doc_id, len)
         SELECT tot.doc_id, n_fingerprints,
                coalesce(n_dup_fps, 0) AS n_dup_fps,
                coalesce(n_dup_spans, 0) AS n_dup_spans,
                coalesce(dup_chars, 0) AS dup_chars,
                floor(coalesce(dup_chars, 0) * 10000.0 / len) / 10000
                  AS dup_ratio
         FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id
         ORDER BY tot.doc_id""",
    "text_boilerplate_ngrams" ->
      """WITH ds AS (SELECT source, count(*) AS n_docs
                     FROM documents GROUP BY source),
              tok AS (SELECT source, doc_id, string_split(text, ' ') AS t
                      FROM documents WHERE len(string_split(text, ' ')) >= 3),
              g AS (SELECT DISTINCT source, doc_id,
                           md5(unnest(list_transform(range(1, len(t) - 1),
                             k -> t[k] || ' ' || t[k+1] || ' ' || t[k+2])))
                             AS h
                    FROM tok),
              df AS (SELECT source, h, count(*) AS df
                     FROM g GROUP BY source, h),
              agg AS (SELECT source, count(*) AS n_distinct_3grams,
                             CAST(coalesce(sum(CASE WHEN df >= 3 THEN 1 END),
                                           0) AS BIGINT)
                               AS n_boilerplate_3grams,
                             max(df) AS max_df
                      FROM df GROUP BY source)
         SELECT agg.source, n_docs, n_distinct_3grams,
                n_boilerplate_3grams, max_df
         FROM agg JOIN ds ON agg.source = ds.source
         ORDER BY agg.source""",
    "sample_downweight_duplicates" ->
      """WITH h AS (SELECT source, doc_id, md5(text) AS h,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS n_tok
                    FROM documents),
              cs AS (SELECT h, count(*) AS csize FROM h GROUP BY h),
              j AS (SELECT source, n_tok, csize
                    FROM h JOIN cs USING (h)),
              agg AS (SELECT source, count(*) AS n_docs,
                             CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
                             floor(CAST(sum(CAST(n_tok / csize
                                     AS DECIMAL(28,10))) AS DOUBLE)
                                   * 10000.0) / 10000 AS eff_tokens
                      FROM j GROUP BY source),
              uq AS (SELECT source, count(DISTINCT h) AS n_unique
                     FROM h GROUP BY source)
         SELECT agg.source, n_docs, n_unique, raw_tokens, eff_tokens,
                floor((1.0 - eff_tokens / raw_tokens) * 10000.0) / 10000
                  AS discount
         FROM agg JOIN uq ON agg.source = uq.source
         ORDER BY agg.source""",
    "sample_weighted_reservoir" ->
      """WITH kdoc AS (SELECT doc_id, lang,
                             CAST(len(string_split(text, ' ')) AS BIGINT)
                               AS n_tok,
                             CAST(list_aggregate(list_transform(range(1, 13),
                               j -> (strpos('0123456789abcdef',
                                      substr(md5('wrs:'
                                             || CAST(doc_id AS VARCHAR)),
                                             CAST(j AS INT), 1)) - 1)
                                    * pow(16, 12 - j)), 'sum') AS BIGINT)
                               AS u48
                      FROM documents),
              k AS (SELECT doc_id, lang, n_tok,
                           CAST(floor(-ln((CAST(u48 AS DOUBLE) + 1.0)
                                 / 281474976710656.0)
                                 / CAST(n_tok AS DOUBLE) * 1e12) AS BIGINT)
                             AS kq
                    FROM kdoc WHERE n_tok >= 1),
              rk AS (SELECT doc_id, lang, n_tok, kq,
                            row_number() OVER (ORDER BY kq, doc_id)
                              AS rank
                     FROM k)
         SELECT CAST(rank AS BIGINT) AS rank, doc_id, lang, n_tok, kq
         FROM rk WHERE rank <= 25 ORDER BY rank""",
    "sample_reservoir_hashrank" ->
      """WITH r AS (SELECT lang, doc_id,
                           md5('rsv:' || CAST(doc_id AS VARCHAR)) AS u
                    FROM documents),
              rk AS (SELECT lang, doc_id,
                            row_number() OVER (PARTITION BY lang
                              ORDER BY u, doc_id) AS r
                     FROM r)
         SELECT lang, r, doc_id FROM rk WHERE r <= 20
         ORDER BY lang, r""",
    "feature_hashed_ngrams" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents WHERE doc_id % 7 = 0),
              f AS (SELECT doc_id, unnest(
                             list_concat(t, list_transform(range(1, len(t)),
                               k -> t[k] || ' ' || t[k+1]))) AS f
                    FROM tok),
              b AS (SELECT doc_id,
                           ((strpos('0123456789abcdef',
                               substr(md5(f), 1, 1)) - 1) * 16
                            + (strpos('0123456789abcdef',
                                substr(md5(f), 2, 1)) - 1)) % 64 AS bucket
                    FROM f),
              c AS (SELECT doc_id, bucket, count(*) AS cnt
                    FROM b GROUP BY doc_id, bucket),
              top AS (SELECT doc_id, bucket AS top_bucket, cnt AS top_cnt,
                             row_number() OVER (PARTITION BY doc_id
                               ORDER BY cnt DESC, bucket) AS rn
                      FROM c),
              agg AS (SELECT doc_id, count(*) AS n_nz,
                             floor(sqrt(sum(cnt * cnt)) * 10000.0) / 10000
                               AS l2_norm
                      FROM c GROUP BY doc_id)
         SELECT agg.doc_id, n_nz, top_bucket, top_cnt, l2_norm
         FROM agg JOIN top ON agg.doc_id = top.doc_id AND rn = 1
         ORDER BY agg.doc_id""",
    "pipeline_chunk_embed_e2e" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS len
                       FROM documents),
              ch AS (SELECT doc_id, doc_id || '#' || i AS cid,
                            substr(text, CAST(i * 80 + 1 AS INT), 120)
                              AS chunk
                     FROM (SELECT doc_id, text,
                                  unnest(generate_series(0,
                                    (greatest(len - 120, 0) + 79) // 80))
                                    AS i
                           FROM base)),
              tokd AS (SELECT doc_id, cid,
                              (CAST(strpos('0123456789abcdef',
                                      substr(md5(w), 1, 1)) - 1
                                    AS BIGINT)) * 16
                              + (CAST(strpos('0123456789abcdef',
                                       substr(md5(w), 2, 1)) - 1
                                     AS BIGINT)) AS dim
                       FROM (SELECT doc_id, cid,
                                    unnest(string_split(chunk, ' ')) AS w
                             FROM ch)),
              emb AS (SELECT doc_id, cid, dim, count(*) AS c
                      FROM tokd GROUP BY doc_id, cid, dim),
              probes0 AS (SELECT * FROM emb WHERE doc_id % 97 = 0),
              cands0 AS (SELECT * FROM emb WHERE doc_id % 5 = 0),
              nc AS (SELECT count(DISTINCT cid) AS nc FROM cands0),
              keep AS (SELECT dim FROM
                         (SELECT dim, count(*) AS df
                          FROM cands0 GROUP BY dim) CROSS JOIN nc
                       WHERE df * 10 <= nc * 3),
              probes AS (SELECT probes0.* FROM probes0
                         JOIN keep USING (dim)),
              cands AS (SELECT cands0.* FROM cands0
                        JOIN keep USING (dim)),
              pnrm AS (SELECT cid AS pcid,
                              sqrt(CAST(sum(c * c) AS DOUBLE)) AS pn
                       FROM probes GROUP BY cid),
              cnrm AS (SELECT cid AS ccid,
                              sqrt(CAST(sum(c * c) AS DOUBLE)) AS cn
                       FROM cands GROUP BY cid),
              dots AS (SELECT p.cid AS pcid, c.cid AS ccid,
                              CAST(sum(p.c * c.c) AS BIGINT) AS dot
                       FROM cands c JOIN probes p
                         ON p.dim = c.dim AND p.doc_id <> c.doc_id
                       GROUP BY p.cid, c.cid),
              sc AS (SELECT pcid, ccid, dot,
                            floor((CAST(dot AS DOUBLE) / (pn * cn))
                                  * 10000.0) / 10000 AS cos
                     FROM dots JOIN pnrm USING (pcid)
                          JOIN cnrm USING (ccid)),
              rk AS (SELECT *, row_number() OVER (PARTITION BY pcid
                            ORDER BY cos DESC, ccid) AS rank
                     FROM sc)
         SELECT pcid, CAST(rank AS INTEGER) AS rank, ccid, dot, cos
         FROM rk WHERE rank <= 3 ORDER BY pcid, rank""",
  )
}
