package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over the `documents` table (SURVEY.md §2.10,
  * north-star "text analysis") plus the generator/UDTF surface.
  * Everything here is pure-SQL-expressible → DuckDB-oracle-checked.
  *
  * Determinism: word/bigram rankings order by (count DESC, term) and
  * tf-idf by (rounded score DESC, doc_id, word) so cross-engine
  * low-bit float drift cannot flip row order; every query ends in a
  * total ORDER BY.
  *
  * Scale notes (100 TB): tokenization is a per-row generator (explode)
  * — no shuffle until the groupBy, which partial-aggregates (word,
  * count) map-side, so the shuffle carries unique terms per partition,
  * not tokens. Top-k per group is window-over-aggregated-counts (the
  * aggregated term table is orders of magnitude smaller than the
  * corpus). tf-idf joins tf (doc,word) with df (word) — both sides are
  * aggregates; the document-count side is a 1-row broadcast. Nothing
  * collects to the driver.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tokenize + explode + top-5 words per language.
    "text_tokenize_wordcount" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy("lang", "word")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("lang").orderBy(col("c").desc, col("word"))
      cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("lang", "rn", "word", "c")
        .orderBy("lang", "rn")
    }),

    // Bigram counts: adjacent-token pairs via zip_with over two
    // shifted slices (no index-sequence pitfalls), global top-20.
    "text_ngrams" -> ((s, d) =>
      Tables.documents(s, d)
        .select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1), (a, b) -> concat(a, ' ', b))"
        )).as("bg"))
        .groupBy("bg")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("bg"))
        .limit(20)),

    // Per-(lang, source) document statistics.
    "text_stats_by_lang" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          round(stddev(col("n_chars")), 4).as("sd_chars"),
          round(avg(length(col("text"))), 4).as("avg_len"))
        .orderBy("lang", "source")),

    // tf·log(N/df) TF-IDF, pure relational formulation: tf and df are
    // aggregates of the token table; N is a 1-row broadcast aggregate
    // (never a driver-side .count()).
    "text_tfidf_topterms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfc = tok.groupBy("word").agg(countDistinct("doc_id").as("df"))
      val nDf = docs.agg(count(lit(1)).as("n"))
      tf.join(dfc, "word")
        .crossJoin(broadcast(nDf))
        .select(col("doc_id"), col("word"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 4).as("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("word"))
        .limit(20)
    }),

    // PII scrubbing — the compliance filter of a training-data
    // pipeline: emails/phones regex-redacted in one codegen'd per-row
    // pass (no shuffle). The fixture has no PII, so deterministic
    // synthetic contact strings are appended first and the md5 of the
    // scrubbed text proves exact byte equality of the redaction.
    // Patterns stay in the Java↔RE2 shared subset.
    "text_pii_scrub" -> ((s, d) => {
      val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
      Tables.documents(s, d)
        .withColumn("dirty",
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +001-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .select(col("doc_id"),
          md5(regexp_replace(
            regexp_replace(col("dirty"), email, "<EMAIL>"),
            phone, "<PHONE>")).as("scrubbed_md5"),
          regexp_count(col("dirty"), lit(email)).as("n_emails"),
          regexp_count(col("dirty"), lit(phone)).as("n_phones"))
        .orderBy("doc_id")
    }),

    // Null-preserving generator (explode_outer): rows whose array is
    // EMPTY survive with a null element — the semantics a curation
    // pipeline needs when "no tokens extracted" must not silently
    // drop the document. The oracle emulates it by substituting
    // [NULL] for empty lists before unnest.
    "udtf_explode_outer" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), w -> length(w) > 6)").as("longw"))
        .select(col("doc_id"), explode_outer(col("longw")).as("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_rows"),
          count(col("word")).as("n_words"))
        .orderBy("doc_id")),

    // Table-generating function: one row per token with its position
    // (posexplode); the oracle zips parallel unnests (DuckDB 1.0 has
    // no WITH ORDINALITY — SURVEY §5.4.5).
    "udtf_generator" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")),
  )

  val oracles: Map[String, String] = Map(
    "udtf_explode_outer" ->
      """WITH a AS (SELECT doc_id,
                list_filter(string_split(text, ' '),
                            w -> length(w) > 6) AS longw
              FROM documents WHERE doc_id % 199 = 0),
              x AS (SELECT doc_id,
                unnest(CASE WHEN len(longw) = 0 THEN [NULL]
                            ELSE longw END) AS word
              FROM a)
         SELECT doc_id, count(*) AS n_rows, count(word) AS n_words
         FROM x GROUP BY doc_id ORDER BY doc_id""",
    "text_pii_scrub" ->
      """WITH d AS (SELECT doc_id,
                text || ' contact user' || doc_id || '@example.com or +001-555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
              FROM documents)
         SELECT doc_id,
                md5(regexp_replace(regexp_replace(dirty,
                    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}',
                    '<EMAIL>', 'g'),
                  '\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}', '<PHONE>', 'g'))
                  AS scrubbed_md5,
                CAST(len(regexp_extract_all(dirty,
                  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}')) AS INT)
                  AS n_emails,
                CAST(len(regexp_extract_all(dirty,
                  '\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS INT) AS n_phones
         FROM d ORDER BY doc_id""",
    "text_tokenize_wordcount" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS word
                      FROM documents),
              cnt AS (SELECT lang, word, count(*) AS c FROM tok GROUP BY 1, 2),
              rk AS (SELECT lang, word, c,
                            row_number() OVER (PARTITION BY lang
                                               ORDER BY c DESC, word) AS rn
                     FROM cnt)
         SELECT lang, CAST(rn AS INTEGER) AS rn, word, c
         FROM rk WHERE rn <= 5 ORDER BY lang, rn""",
    "text_ngrams" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
              big AS (SELECT unnest(list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i+1])) AS bg
                      FROM tok WHERE len(t) >= 2)
         SELECT bg, count(*) AS c FROM big
         GROUP BY bg ORDER BY c DESC, bg LIMIT 20""",
    "text_stats_by_lang" ->
      """SELECT lang, source, count(*) AS n_docs,
                round(avg(n_chars), 4) AS avg_chars,
                min(n_chars) AS min_chars,
                max(n_chars) AS max_chars,
                round(stddev_samp(n_chars), 4) AS sd_chars,
                round(avg(length(text)), 4) AS avg_len
         FROM documents GROUP BY 1, 2 ORDER BY lang, source""",
    "text_tfidf_topterms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents),
              tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
              df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
              n AS (SELECT count(*) AS n FROM documents)
         SELECT t.doc_id, t.word,
                round(t.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf
         FROM tf t JOIN df USING (word) CROSS JOIN n
         ORDER BY tfidf DESC, doc_id, word LIMIT 20""",
    "udtf_generator" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                      FROM documents WHERE doc_id % 199 = 0)
         SELECT doc_id,
                CAST(unnest(generate_series(0, len(t)-1)) AS INTEGER) AS pos,
                unnest(t) AS token
         FROM tok ORDER BY doc_id, pos""",
  )
}
