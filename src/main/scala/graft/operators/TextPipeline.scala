package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data text-pipeline operators beyond §2.10's basics:
  * language identification, quality scoring, token counting, document
  * fingerprinting, and the multimodal feature-extraction plumbing.
  * All five are deterministic and DuckDB-oracle-checked.
  *
  * Honesty notes:
  *   - `text_langid_heuristic` learns per-language token-frequency
  *     profiles from the corpus itself and predicts by best profile
  *     score. The fixture's languages share one uniform vocabulary, so
  *     accuracy ≈ chance HERE — that is a property of the synthetic
  *     fixture, not the operator; the declared output is the full
  *     confusion matrix, which makes this visible rather than hiding it.
  *   - `multimodal_features`' "decode" is a clearly-marked STUB
  *     (deterministic arithmetic over the bytes): real image/audio
  *     decoders aren't in this container. The Spark-side plumbing —
  *     binary column, schema, per-row feature extraction, join with
  *     the vector table — is real and oracle-checked.
  *
  * Scale notes (100 TB): profiles/stopword tables are tiny aggregates
  * (vocab-sized) and broadcast; all per-doc metrics are single-pass
  * projections or one groupBy on doc_id; fingerprint selection (hex
  * prefix '0') is content-defined sampling — the 1/16 of shingle
  * hashes kept is decided by the hash value itself (winnowing-style),
  * so two copies of a document always keep the same fingerprints
  * regardless of partitioning.
  */
object TextPipeline {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Corpus-profile language ID → confusion matrix (true × predicted).
    "text_langid_heuristic" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val prof = docs
        .select(col("lang").as("plang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("plang", "w").agg(count(lit(1)).as("n"))
      val tot = prof.groupBy("plang").agg(sum("n").as("tot"))
      val share = prof.join(tot, "plang")
        .select(col("plang"), col("w"),
          (col("n").cast("double") / col("tot")).as("sh"))
      val score = tok.join(broadcast(share), "w")
        .groupBy("doc_id", "plang").agg(sum("sh").as("sc"))
      val w = Window.partitionBy("doc_id")
        .orderBy(round(col("sc"), 4).desc, col("plang"))
      val pred = score.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      docs.select(col("doc_id"), col("lang").as("true_lang"))
        .join(pred, "doc_id")
        .groupBy(col("true_lang"), col("plang").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_lang", "pred_lang")
    }),

    // Per-doc quality metrics: token count, type-token ratio, mean
    // token length, stopword ratio (top-5 corpus tokens), composite.
    "text_quality_score" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val top5 = tok.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(5)
        .select(col("w").as("sw"))
      // Ratio outputs use floor-scaling (floor(x·10⁴)/10⁴), NOT
      // round(): round() disagrees cross-engine when a value's
      // shortest decimal repr lands on .xxxx5 (Spark rounds the
      // decimal string, DuckDB the binary value — §5.4.2, observed at
      // sf0.1 with dyadic token counts), while floor is evaluated on
      // identical double bits in both engines.
      def trunc4(c: org.apache.spark.sql.Column) =
        floor(c * 10000).cast("double") / 10000.0
      tok.filter(col("doc_id") % 10 === 0)
        .join(broadcast(top5), col("w") === col("sw"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tok"),
          countDistinct("w").as("n_types"),
          avg(length(col("w"))).as("len_raw"),
          (count(col("sw")).cast("double") / count(lit(1))).as("stop_raw"))
        .select(col("doc_id"), col("n_tok"), col("n_types"),
          trunc4(col("n_types").cast("double") / col("n_tok")).as("ttr"),
          trunc4(col("len_raw")).as("avg_tok_len"),
          trunc4(col("stop_raw")).as("stop_ratio"),
          trunc4(col("n_types").cast("double") / col("n_tok") * 0.4
            + (lit(1) - col("stop_raw")) * 0.3
            + least(col("n_tok") / 100.0, lit(1.0)) * 0.3).as("quality"))
        .orderBy("doc_id")
    }),

    // Token counting two ways: whitespace tokens and BPE-ish subword
    // units (consonant-onset + vowel-run regex).
    "text_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_ws"),
          regexp_count(col("text"), lit("[bcdfghjklmnpqrstvwxyz]*[aeiou]+"))
            .cast("int").as("n_sub"),
          length(col("text")).as("n_chars_m"),
          round(lit(100.0) * size(split(col("text"), " ")) / length(col("text")), 4)
            .as("tok_per_100"))
        .orderBy("doc_id")),

    // Document fingerprinting: md5 over word-5-shingles with
    // content-defined selection (hex prefix '0' → 1/16 kept).
    "text_fingerprint_rolling" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(t) - 4), k -> concat_ws(' ',
               element_at(t, k), element_at(t, k+1), element_at(t, k+2),
               element_at(t, k+3), element_at(t, k+4)))"""
        )).as("sh"))
        .select(col("doc_id"), md5(col("sh")).as("fp"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_sh"),
          count(when(col("fp").startsWith("0"), 1)).as("n_fp"),
          min(when(col("fp").startsWith("0"), col("fp"))).as("min_fp"))
        .orderBy("doc_id")),

    // Span-level internal dedup (r7): which WORD-8-GRAM spans appear
    // in MORE THAN ONE document — the span-granularity member of the
    // dedup family (exact doc / paragraph / near-dup pair / span),
    // i.e. the shape of suffix-array substring dedup (the
    // "deduplicate long repeated substrings" training-data op)
    // re-expressed as a shingle inverted index: explode 8-word
    // spans, md5 BEFORE the shuffle (16-byte keys move, never text),
    // count DISTINCT docs per hash, join the duplication marks back
    // per doc. Output per doc: total spans, spans shared with ≥1
    // other doc, floor-scaled dup ratio. Scale notes (r13 tightened,
    // ShuffleAudit): the span explode runs ONCE, there is NO join,
    // and the span frame crosses the wire exactly ONCE — an explicit
    // repartition(h) whose HashPartitioning(h) satisfies BOTH the
    // (h, doc_id) aggregate's and the h window's clustering, so
    // neither plans its own exchange (the r7 shape shuffled the span
    // frame twice: once into the agg on (h, doc_id), once into the h
    // window — measured 17.5 MB for a 1.4 MB corpus; now ~1× the
    // hash frame + the doc-grain census). Keys move as unhex(md5) —
    // 16 raw bytes, not 32 hex chars (the hash is internal: both
    // engines agree on the bytes, the output never carries it).
    // PlanShapeSpec pins the single Generate, the join-free shape,
    // and the single span-grain exchange; no all-pairs doc×doc stage
    // exists at any size.
    "text_span_dedup" -> ((s, d) => {
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 8)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(t) - 7), k -> concat_ws(' ',
               element_at(t, k), element_at(t, k+1), element_at(t, k+2),
               element_at(t, k+3), element_at(t, k+4), element_at(t, k+5),
               element_at(t, k+6), element_at(t, k+7)))"""
        )).as("sp"))
        .select(col("doc_id"), unhex(md5(col("sp"))).as("h"))
        .repartition(col("h"))
        .groupBy("h", "doc_id")
        .agg(count(lit(1)).as("c"))
      pairs
        .withColumn("nd",
          count(lit(1)).over(Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(
          sum(col("c")).as("n_spans"),
          coalesce(sum(when(col("nd") > 1, col("c"))), lit(0L))
            .as("n_dup_spans"),
          (floor(coalesce(sum(when(col("nd") > 1, col("c"))), lit(0L)) *
            lit(10000.0) / sum(col("c"))) / 10000).as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // Multimodal feature extraction plumbing: opaque binary column +
    // typed metadata + per-row "decode" (STUB: deterministic
    // arithmetic over the bytes — real decoders are not in this
    // container) + join with the vector table.
    "multimodal_features" -> ((s, d) =>
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .filter(col("doc_id") % 50 === 0)
        .withColumn("bytes", col("text").cast("binary")) // stand-in for image/audio payload
        .select(
          col("doc_id"),
          length(col("bytes")).as("n_bytes"),
          md5(col("bytes")).as("content_md5"),
          ascii(substring(col("text"), 1, 1)).as("first_byte"),
          ((length(col("bytes")).cast("long") * 31 + ascii(substring(col("text"), 1, 1)))
            % 997).as("fake_feat"), // STUB decode output
          round(sqrt(expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)"
          )), 4).as("vnorm"))
        .orderBy("doc_id")),

    "multimodal_frame_sample" -> frameSample,

    // "Resize" over the opaque payload (STUB decode: stride-4 byte
    // downsampling stands in for pixel resampling — real codecs are
    // not in this container). Output: old/new sizes + checksum of the
    // downsampled payload.
    // Deterministic content-hash sampling / train-test split: the
    // md5-prefix bucket decides membership, so the split is
    // reproducible across engines, runs, partitionings, and re-ingests
    // of the same corpus — unlike random sampling, THE property a
    // training-data pipeline needs (no leakage when data is re-staged).
    // '0'|'1' prefix ≈ 2/16 → ~12.5% test split.
    // Sequence packing (round 6): concatenate documents in id order
    // and chunk into fixed token-budget training sequences — the step
    // between curation and the trainer. A document lands in the pack
    // where its first token falls (pack = prev-cumsum div budget),
    // i.e. streaming concat-then-chunk. Packing is PER SHARD
    // (doc_id % 8): each shard's window is independent, so the job is
    // embarrassingly parallel at 100 TB — a global pack order would
    // serialize on one partition, which is exactly what this shape
    // avoids (the trainer only needs within-sequence order, not a
    // corpus-global one). Output per pack: doc count, token count,
    // fill ratio vs the 2048 budget; all counts are COUNT/window sums
    // of BIGINTs cast explicitly in the oracle (HUGEINT-proofed).
    "text_sequence_pack" -> ((s, d) => {
      val budget = 2048
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(8)).cast("long").as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .withColumn("cum_prev", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("pack_id", expr(s"cum_prev div $budget"))
        .groupBy("shard", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .withColumn("fill",
          floor(col("n_tokens") * lit(10000L) / lit(budget.toLong))
            .cast("double") / 10000.0)
        .orderBy("shard", "pack_id")
    }),

    // Fixed-size overlapping chunking (round 9, VERDICT r8 #6): the
    // RAG/embedding-prep primitive between `text_sequence_pack` and
    // `text_dedup_paragraph`. Chunk width 120 chars, stride 80 (40
    // overlap so no boundary-straddling span is lost); the LAST chunk
    // truncates at the doc end and every doc yields ≥ 1 chunk.
    // n_chunks = 1 + ceil(max(len−120, 0)/80) — integer-exact in both
    // engines via (extra+79) div 80. Chunk ids are DETERMINISTIC
    // content-free addresses md5(doc_id#idx) (stable across reruns &
    // re-partitioning — the id an embedding row joins back on), while
    // chunk_md5 hashes the chunk TEXT (the dedup key downstream).
    // Scale: pure per-row generator — no shuffle at all before the
    // final presentation sort; ~len/80 rows/doc, each carrying only
    // hashes + offsets (the chunk text itself is dropped before any
    // exchange). At 100 TB this is a map-only pass that pipelines
    // straight into the embedding UDF batch.
    "text_chunk_sliding" -> ((s, d) => {
      val C = 120; val S = 80
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        .select(col("doc_id"), col("text"), explode(expr(
          s"""transform(
                sequence(0L, (greatest(len - $C, 0) + ${S - 1}) div $S),
                i -> named_struct('i', i, 'p', cast(i * $S + 1 as int)))"""
        )).as("c"))
        .select(
          col("doc_id"),
          col("c.i").as("chunk_idx"),
          md5(concat(col("doc_id").cast("string"), lit("#"),
            col("c.i").cast("string"))).as("chunk_id"),
          col("c.p").cast("long").as("start_char"),
          expr(s"substring(text, c.p, $C)").as("chunk"))
        .select(
          col("doc_id"), col("chunk_idx"), col("chunk_id"),
          col("start_char"),
          length(col("chunk")).cast("long").as("chunk_chars"),
          md5(col("chunk")).as("chunk_md5"),
          size(split(col("chunk"), " ")).cast("long").as("n_tok"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Deterministic importance-weighted sampling (round 6): the
    // training-mix reweighting primitive. Every doc gets an inclusion
    // probability p = min(1, n_chars/4000) (longer docs up-weighted)
    // and is kept iff its content hash falls under the per-row
    // threshold: substr(md5(text),1,6) < lpad(hex(floor(p·(16⁶−1))))
    // — equal-length lowercase hex compares lexicographically ==
    // numerically, the same trick as sample_hash_split but with a
    // VARIABLE per-row rate. Pure projection + one aggregate: no
    // shuffle before the groupBy, reproducible across any
    // partitioning/cluster size because the coin is the content
    // itself. At 100 TB this replaces rand()-based sampling, whose
    // per-task seeds make reruns irreproducible.
    "sample_importance_weighted" -> ((s, d) => {
      val p = least(lit(1.0), length(col("text")) / 4000.0)
      val thresh = lpad(lower(hex(floor(p * 16777215.0).cast("long"))),
        6, "0")
      Tables.documents(s, d)
        .withColumn("kept", substring(md5(col("text")), 1, 6) < thresh)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_total"),
          count(when(col("kept"), lit(1))).as("n_kept"),
          round(sum(when(col("kept"),
            col("n_chars").cast("decimal(18,2)")))
            .cast("double"), 4).as("kept_chars"))
        .orderBy("lang")
    }),

    "sample_hash_split" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("split",
          when(md5(col("text")) < "2", "test").otherwise("train"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("split")),

    "multimodal_resize" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 101 === 0)
        .select(
          col("doc_id"),
          length(col("text")).as("orig_len"),
          (length(col("text")) / 4).cast("int").as("new_len"),
          md5(expr(
            """concat_ws('', transform(sequence(1, CAST(length(text) / 4 AS INT)),
                 i -> substring(text, (i - 1) * 4 + 1, 1)))"""
          )).as("resized_md5"),
          substring(col("text"), 1, 1).as("px0"))
        .orderBy("doc_id")),

    // Perceptual-hash near-dup over the opaque payload (r12) — the
    // image-dedup leg the multimodal family lacked: aHash (average
    // hash) over a STUB decode (64 byte positions sampled at uniform
    // stride stand in for an 8×8 grayscale downsample — real codecs
    // are not in this container; the fixture is ASCII so char code ==
    // byte value), bit_p = sample_p·64 > Σsamples (all-integer, no
    // mean division), packed into two 32-bit words. Near-dup JOIN is
    // 4×16-bit band pigeonhole (the dedup_simhash geometry): any pair
    // with hamming ≤ 3 shares an identical band BY CONSTRUCTION
    // (3 differing bits can't touch all 4 bands), so the banded
    // equi-join is recall-complete at that radius and NEVER all-pairs
    // — at 100 TB only 8-byte phashes shuffle, never payloads, and a
    // band bucket holds only codes that agree on 16 bits. Exact
    // hamming (bit_count(xor), integer codegen) verifies collisions.
    // Output: the 10 closest candidate pairs + a census row (sampled
    // docs, candidate-pair volume — the number that tunes the band
    // geometry before a real run; kind='census', hamming=-1).
    "multimodal_phash" -> ((s, d) => {
      // length ≥ 64 guard (ADVICE r12): an empty doc makes the stride
      // operand negative, where Spark's `div` truncates toward zero
      // but DuckDB's `//` floors — guard BOTH sides (the audio key's
      // nf > 0 precedent) so the key is fixture-scale-proof, and a
      // real 8×8 downsample needs ≥64 bytes anyway.
      val ph = Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0 && length(col("text")) >= 64)
        .select(col("doc_id"), expr(
          """transform(sequence(0, 63), p ->
               CAST(ascii(substring(text,
                 1 + CAST((p * (length(text) - 1)) div 63 AS INT), 1))
                 AS BIGINT))""").as("gray"))
        .withColumn("tot",
          expr("aggregate(gray, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("wlo", expr(
          """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (a, p) ->
               a + IF(element_at(gray, p + 1) * 64 > tot,
                      shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))"""))
        .withColumn("whi", expr(
          """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (a, p) ->
               a + IF(element_at(gray, p + 33) * 64 > tot,
                      shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))"""))
        .select("doc_id", "wlo", "whi")
      val banded = ph.select(col("doc_id"), col("wlo"), col("whi"),
        posexplode(expr(
          """array(wlo & 65535, shiftright(wlo, 16) & 65535,
                   whi & 65535, shiftright(whi, 16) & 65535)"""))
          .as(Seq("band", "bval")))
      val pairs = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bval") === col("y.bval") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          expr("CAST(bit_count(x.wlo ^ y.wlo) + bit_count(x.whi ^ y.whi) AS BIGINT)")
            .as("hamming"))
        .distinct()
      val top = pairs.orderBy(col("hamming"), col("a"), col("b")).limit(10)
        .select(lit("pair").as("kind"), col("a"), col("b"), col("hamming"))
      val census = ph.agg(count(lit(1)).as("a"))
        .crossJoin(pairs.agg(count(lit(1)).as("b"))) // 1-row × 1-row
        .select(lit("census").as("kind"), col("a"), col("b"),
          lit(-1L).as("hamming"))
      top.unionByName(census).orderBy("kind", "a", "b")
    }),

    // Audio-frame energy census (r12) — the AUDIO leg of the
    // multimodal family (phash covers images, frame_sample covers
    // video): STUB decode treats the payload bytes as centered PCM
    // samples (ascii − 100 — real codecs aren't in this container;
    // the Spark-side frame/window/census plumbing is the real thing),
    // frames = non-overlapping 32-sample windows, per-frame energy =
    // Σ sample² (exact integers end-to-end — no sqrt, no doubles
    // anywhere in this key). "Quiet" frames are SELF-CALIBRATED
    // against the doc's own mean frame energy via the integer
    // cross-multiplication sum_sq·n_frames < Σenergy (no division,
    // no threshold constant to tune per corpus). Scale: pure per-row
    // nested-HOF projection (codegen'd), zero shuffles before the
    // presentation sort — the same map-only shape the chunking keys
    // pipeline into batch UDFs at 100 TB.
    "multimodal_audio_rms" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 11 === 0)
        .withColumn("nf", expr("CAST(length(text) div 32 AS INT)"))
        .filter(col("nf") > 0)
        .withColumn("frames", expr(
          """transform(sequence(0, nf - 1), f ->
               aggregate(sequence(1, 32), CAST(0 AS BIGINT), (a, i) ->
                 a + CAST((ascii(substring(text, f * 32 + i, 1)) - 100)
                     * (ascii(substring(text, f * 32 + i, 1)) - 100)
                     AS BIGINT)))"""))
        .withColumn("energy",
          expr("aggregate(frames, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("peak", expr(
          """aggregate(sequence(1, nf * 32), CAST(0 AS BIGINT), (a, i) ->
               greatest(a, CAST(abs(ascii(substring(text, i, 1)) - 100)
                               AS BIGINT)))"""))
        .select(col("doc_id"), col("nf").cast("long").as("n_frames"),
          col("energy"),
          expr("CAST(size(filter(frames, x -> x * nf < energy)) AS BIGINT)")
            .as("n_quiet"), col("peak"))
        .orderBy("doc_id")
    }),
  )

  /** Frame sampling over an opaque binary payload (STUB decode: the
    * "video" is the document's bytes; a frame is a fixed 32-byte
    * window at stride 64, checksummed instead of pixel-decoded —
    * real codecs are not in this container). The Spark-side plumbing
    * — per-row generator over frame offsets, bounded frames/doc,
    * deterministic frame ids — is the real thing.
    */
  // `def`, not `val`: referenced from `queries` above, which
  // initializes first.
  private def frameSample: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") % 101 === 0)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"), col("text"), explode(expr(
        """filter(transform(sequence(0, 3),
             k -> named_struct('frame_idx', k, 'off', k * 64 + 1)),
             f -> f.off + 31 <= length(text))"""
      )).as("f"))
      .select(
        col("doc_id"),
        col("f.frame_idx").as("frame_idx"),
        md5(expr("substring(text, f.off, 32)")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  val oracles: Map[String, String] = Map(
    "text_sequence_pack" ->
      """WITH toks AS (SELECT doc_id, doc_id % 8 AS shard,
                              CAST(len(string_split(text, ' ')) AS BIGINT)
                                AS n_tok
                       FROM documents),
              c AS (SELECT doc_id, shard, n_tok,
                           CAST(coalesce(sum(n_tok) OVER (PARTITION BY
                             shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                             PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                             AS cum_prev
                    FROM toks)
         SELECT shard, cum_prev // 2048 AS pack_id,
                count(*) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                CAST(min(doc_id) AS BIGINT) AS first_doc,
                CAST(max(doc_id) AS BIGINT) AS last_doc,
                CAST(floor(CAST(sum(n_tok) AS BIGINT) * 10000 // 2048)
                     AS DOUBLE) / 10000 AS fill
         FROM c GROUP BY shard, cum_prev // 2048
         ORDER BY shard, pack_id""",
    "text_chunk_sliding" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS len
                       FROM documents),
              g AS (SELECT doc_id, text,
                           unnest(generate_series(0,
                             (greatest(len - 120, 0) + 79) // 80)) AS i
                    FROM base),
              c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                           CAST(i * 80 + 1 AS BIGINT) AS start_char,
                           substr(text, CAST(i * 80 + 1 AS INT), 120)
                             AS chunk
                    FROM g)
         SELECT doc_id, chunk_idx,
                md5(doc_id || '#' || chunk_idx) AS chunk_id,
                start_char,
                CAST(length(chunk) AS BIGINT) AS chunk_chars,
                md5(chunk) AS chunk_md5,
                CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tok
         FROM c ORDER BY doc_id, chunk_idx""",
    "sample_importance_weighted" ->
      """WITH k AS (SELECT lang, n_chars,
                           substr(md5(text), 1, 6)
                             < lpad(lower(to_hex(CAST(floor(
                                 least(1.0, length(text) / 4000.0)
                                 * 16777215) AS BIGINT))), 6, '0') AS kept
                    FROM documents)
         SELECT lang, count(*) AS n_total,
                count(CASE WHEN kept THEN 1 END) AS n_kept,
                round(CAST(sum(CASE WHEN kept
                      THEN CAST(n_chars AS DECIMAL(18,2)) END) AS DOUBLE), 4)
                  AS kept_chars
         FROM k GROUP BY lang ORDER BY lang""",
    "sample_hash_split" ->
      """SELECT CASE WHEN md5(text) < '2' THEN 'test' ELSE 'train' END AS split,
                count(*) AS n,
                CAST(min(doc_id) AS BIGINT) AS min_id,
                CAST(max(doc_id) AS BIGINT) AS max_id
         FROM documents GROUP BY 1 ORDER BY split""",
    "multimodal_resize" ->
      """SELECT doc_id,
                CAST(length(text) AS INTEGER) AS orig_len,
                CAST(length(text) // 4 AS INTEGER) AS new_len,
                md5(array_to_string(list_transform(
                    range(1, length(text) // 4 + 1),
                    i -> substring(text, (i - 1) * 4 + 1, 1)), ''))
                  AS resized_md5,
                substring(text, 1, 1) AS px0
         FROM documents WHERE doc_id % 101 = 0 ORDER BY doc_id""",
    "multimodal_frame_sample" ->
      """WITH f AS (SELECT doc_id, text, unnest(generate_series(0, 3)) AS k
                    FROM documents WHERE doc_id % 101 = 0)
         SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
                md5(substring(text, k * 64 + 1, 32)) AS frame_md5
         FROM f WHERE k * 64 + 32 <= length(text)
         ORDER BY doc_id, frame_idx""",
    "text_langid_heuristic" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                      FROM documents),
              prof AS (SELECT lang AS plang, unnest(string_split(text, ' ')) AS w
                       FROM documents),
              cnt AS (SELECT plang, w, count(*) AS n FROM prof GROUP BY 1, 2),
              tot AS (SELECT plang, sum(n) AS tot FROM cnt GROUP BY 1),
              share AS (SELECT c.plang, c.w, CAST(c.n AS DOUBLE) / t.tot AS sh
                        FROM cnt c JOIN tot t ON c.plang = t.plang),
              score AS (SELECT k.doc_id, s.plang, sum(s.sh) AS sc
                        FROM tok k JOIN share s ON k.w = s.w GROUP BY 1, 2),
              pred AS (SELECT doc_id, plang,
                              row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(sc, 4) DESC, plang) AS rn
                       FROM score)
         SELECT d.lang AS true_lang, p.plang AS pred_lang, count(*) AS n
         FROM documents d JOIN pred p ON d.doc_id = p.doc_id AND p.rn = 1
         GROUP BY 1, 2 ORDER BY true_lang, pred_lang""",
    "text_quality_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                      FROM documents),
              top5 AS (SELECT w FROM (SELECT w, count(*) AS c,
                                row_number() OVER (ORDER BY count(*) DESC, w) AS rn
                              FROM tok GROUP BY w) WHERE rn <= 5),
              st AS (SELECT t.doc_id, count(*) AS n_tok,
                            count(DISTINCT t.w) AS n_types,
                            avg(length(t.w)) AS len_raw,
                            CAST(count(*) FILTER (WHERE t.w IN
                                 (SELECT w FROM top5)) AS DOUBLE)
                                 / count(*) AS stop_raw
                     FROM tok t WHERE t.doc_id % 10 = 0 GROUP BY 1)
         SELECT doc_id, n_tok, n_types,
                floor(CAST(n_types AS DOUBLE) / n_tok * 10000) / 10000 AS ttr,
                floor(len_raw * 10000) / 10000 AS avg_tok_len,
                floor(stop_raw * 10000) / 10000 AS stop_ratio,
                floor((CAST(n_types AS DOUBLE) / n_tok * 0.4
                       + (1 - stop_raw) * 0.3
                       + least(n_tok / 100.0, 1.0) * 0.3) * 10000) / 10000
                  AS quality
         FROM st ORDER BY doc_id""",
    "text_token_count" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
                CAST(len(regexp_extract_all(text,
                     '[bcdfghjklmnpqrstvwxyz]*[aeiou]+')) AS INTEGER) AS n_sub,
                CAST(length(text) AS INTEGER) AS n_chars_m,
                round(100.0 * len(string_split(text, ' ')) / length(text), 4)
                  AS tok_per_100
         FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""",
    "text_span_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents),
              sh AS (SELECT doc_id,
                            md5(unnest(list_transform(range(1, len(t) - 6),
                              k -> t[k] || ' ' || t[k+1] || ' ' || t[k+2]
                                   || ' ' || t[k+3] || ' ' || t[k+4]
                                   || ' ' || t[k+5] || ' ' || t[k+6]
                                   || ' ' || t[k+7]))) AS h
                     FROM tok WHERE len(t) >= 8),
           marks AS (SELECT h, count(DISTINCT doc_id) AS nd
                     FROM sh GROUP BY h)
         SELECT sh.doc_id, count(*) AS n_spans,
                count(*) FILTER (WHERE nd > 1) AS n_dup_spans,
                floor(count(*) FILTER (WHERE nd > 1) * 10000.0
                      / count(*)) / 10000 AS dup_ratio
         FROM sh JOIN marks ON sh.h = marks.h
         GROUP BY sh.doc_id ORDER BY sh.doc_id""",
    "text_fingerprint_rolling" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents WHERE doc_id % 10 = 0),
              sh AS (SELECT doc_id,
                            md5(unnest(list_transform(range(1, len(t) - 3),
                              k -> t[k] || ' ' || t[k+1] || ' ' || t[k+2]
                                   || ' ' || t[k+3] || ' ' || t[k+4]))) AS fp
                     FROM tok WHERE len(t) >= 5)
         SELECT doc_id, count(*) AS n_sh,
                count(*) FILTER (WHERE fp LIKE '0%') AS n_fp,
                min(fp) FILTER (WHERE fp LIKE '0%') AS min_fp
         FROM sh GROUP BY doc_id ORDER BY doc_id""",
    "multimodal_features" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                md5(text) AS content_md5,
                CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
                CAST((octet_length(encode(text)) * 31
                      + ascii(substring(text, 1, 1))) % 997 AS BIGINT) AS fake_feat,
                round(sqrt(list_aggregate(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4)
                  AS vnorm
         FROM documents JOIN embeddings ON doc_id = vec_id
         WHERE doc_id % 50 = 0 ORDER BY doc_id""",
    "multimodal_phash" ->
      """WITH g AS (SELECT doc_id,
                           list_transform(range(0, 64), p ->
                             CAST(ascii(substring(text,
                               1 + CAST((CAST(p AS INT) * (length(text) - 1))
                                        // 63 AS INT), 1)) AS BIGINT)) AS gray
                    FROM documents
                    WHERE doc_id % 5 = 0 AND length(text) >= 64),
              g2 AS (SELECT doc_id, gray,
                            list_aggregate(gray, 'sum') AS tot FROM g),
              ph AS (SELECT doc_id,
                            CAST(list_aggregate(list_transform(range(0, 32),
                              p -> CASE WHEN gray[CAST(p + 1 AS INT)] * 64 > tot
                                   THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
                                   ELSE CAST(0 AS BIGINT) END), 'sum')
                              AS BIGINT) AS wlo,
                            CAST(list_aggregate(list_transform(range(0, 32),
                              p -> CASE WHEN gray[CAST(p + 33 AS INT)] * 64 > tot
                                   THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
                                   ELSE CAST(0 AS BIGINT) END), 'sum')
                              AS BIGINT) AS whi
                     FROM g2),
              banded AS (SELECT doc_id, wlo, whi, band,
                                CASE band WHEN 0 THEN wlo & 65535
                                          WHEN 1 THEN (wlo >> 16) & 65535
                                          WHEN 2 THEN whi & 65535
                                          ELSE (whi >> 16) & 65535
                                END AS bval
                         FROM ph, (SELECT unnest([0, 1, 2, 3]) AS band)),
              pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                               CAST(bit_count(xor(x.wlo, y.wlo))
                                    + bit_count(xor(x.whi, y.whi)) AS BIGINT)
                                 AS hamming
                        FROM banded x JOIN banded y
                          ON x.band = y.band AND x.bval = y.bval
                             AND x.doc_id < y.doc_id),
              top AS (SELECT 'pair' AS kind, a, b, hamming
                      FROM pairs ORDER BY hamming, a, b LIMIT 10),
              census AS (SELECT 'census' AS kind,
                                (SELECT count(*) FROM ph) AS a,
                                (SELECT count(*) FROM pairs) AS b,
                                CAST(-1 AS BIGINT) AS hamming)
         SELECT kind, a, b, hamming FROM top
         UNION ALL SELECT kind, a, b, hamming FROM census
         ORDER BY kind, a, b""",
    "multimodal_audio_rms" ->
      """WITH d AS (SELECT doc_id, text,
                           CAST(length(text) // 32 AS INT) AS nf
                    FROM documents
                    WHERE doc_id % 11 = 0 AND length(text) // 32 >= 1),
              fr AS (SELECT doc_id, nf,
                            list_transform(range(0, nf), f ->
                              list_aggregate(list_transform(range(1, 33),
                                i -> CAST((ascii(substring(text,
                                       CAST(f * 32 + i AS INT), 1)) - 100)
                                     * (ascii(substring(text,
                                       CAST(f * 32 + i AS INT), 1)) - 100)
                                     AS BIGINT)), 'sum')) AS frames,
                            CAST(list_aggregate(list_transform(
                              range(1, nf * 32 + 1),
                              i -> CAST(abs(ascii(substring(text,
                                     CAST(i AS INT), 1)) - 100)
                                   AS BIGINT)), 'max') AS BIGINT) AS peak
                     FROM d),
              en AS (SELECT doc_id, nf, frames, peak,
                            CAST(list_aggregate(frames, 'sum') AS BIGINT)
                              AS energy
                     FROM fr)
         SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, energy,
                CAST(len(list_filter(frames, x -> x * nf < energy))
                     AS BIGINT) AS n_quiet,
                peak
         FROM en ORDER BY doc_id""",
  )
}
