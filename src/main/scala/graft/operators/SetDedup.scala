package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations and deduplication (SURVEY.md §2.7 — dedup is
  * north-star territory).
  *
  * Determinism: `dropDuplicates` picks an arbitrary survivor, so every
  * declared dedup query uses a deterministic formulation instead —
  * groupBy-aggregate for exact dedup, `row_number() = 1` with a full
  * tiebreak for last-wins (SURVEY §5.4.6). lineitem genuinely contains
  * duplicate rows (7 full-key dups at sf0.01, §1.2) so dedup_exact has
  * real work to do.
  *
  * Scale notes: exact dedup = one shuffle on the dedup key with
  * map-side partial aggregation; last-wins = one shuffle on the
  * partition key (window, no global sort); content-hash dedup hashes
  * before shuffling so the wide text column never moves — only
  * (hash, id) pairs shuffle at 100 TB.
  */
object SetDedup {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // UNION ALL of two overlapping slices (no dedup — multiplicities
    // preserved, proven by the fingerprint counts).
    "set_union_all" -> ((s, d) => {
      def o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      o.filter(col("o_orderstatus") === "F")
        .unionByName(o.filter(col("o_totalprice") > 400000))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          // decimal-exact sum: order-independent at any SF (§5.4.2)
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 4)
            .as("total"))
        .orderBy("o_orderstatus")
    }),

    // Customers who placed BOTH an urgent and a low-priority order.
    "set_intersect" -> ((s, d) => {
      def keys(p: String) = Tables.orders(s, d)
        .filter(col("o_orderpriority") === p).select("o_custkey")
      keys("1-URGENT").intersect(keys("5-LOW")).orderBy("o_custkey")
    }),

    // Customers with an urgent order but NO low-priority order.
    "set_except" -> ((s, d) => {
      def keys(p: String) = Tables.orders(s, d)
        .filter(col("o_orderpriority") === p).select("o_custkey")
      keys("1-URGENT").except(keys("5-LOW")).orderBy("o_custkey")
    }),

    // Exact dedup as multiplicity histogram: groupBy the dedup key,
    // then histogram the group sizes — surfaces lineitem's real dup
    // rows (multiplicity 2 bucket) with a 2-row bounded output.
    "dedup_exact" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey", "l_linenumber", "l_partkey")
        .agg(count(lit(1)).as("multiplicity"))
        .groupBy("multiplicity")
        .agg(count(lit(1)).as("n_keys"))
        .orderBy("multiplicity")),

    // Staging upsert semantics: latest event per user (ts desc,
    // event_id desc as unique tiebreak).
    "dedup_last_wins" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
        .orderBy("user_id")
    }),

    // Content-hash dedup: sha2-256 fingerprint per document + the
    // groups-by-copy-count histogram proving uniqueness.
    "dedup_content_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
        .orderBy("doc_id")),

    // Incremental-ingest dedup — the staging engine's steady state:
    // each arriving micro-batch is anti-joined by content hash against
    // the already-staged corpus, so only genuinely new content lands.
    // At 100 TB the staged-hash side is a bucketed table keyed by the
    // hash (the anti-join then shuffles only the new batch), and the
    // hash set grows append-only with the corpus. doc_id % 5 splits
    // the fixture into "staged" (4/5) and "incoming" (1/5).
    "dedup_incremental_ingest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stagedHashes = docs.filter(col("doc_id") % 5 =!= 0)
        .select(md5(col("text")).as("h")).distinct()
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("h", md5(col("text")))
        .join(stagedHashes, Seq("h"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_new"),
          countDistinct(col("h")).as("n_unique"))
        .orderBy("lang")
    }),
  )

  val oracles: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT o_orderstatus, count(*) AS n,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
                  AS total
         FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
               WHERE o_orderstatus = 'F'
               UNION ALL
               SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
               WHERE o_totalprice > 400000)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
         ORDER BY o_custkey""",
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
         ORDER BY o_custkey""",
    "dedup_exact" ->
      """SELECT multiplicity, count(*) AS n_keys
         FROM (SELECT l_orderkey, l_linenumber, l_partkey,
                      count(*) AS multiplicity
               FROM lineitem GROUP BY 1, 2, 3)
         GROUP BY multiplicity ORDER BY multiplicity""",
    "dedup_last_wins" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
         FROM (SELECT user_id, event_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "dedup_content_hash" ->
      """SELECT doc_id, sha256(text) AS content_hash
         FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""",
    "dedup_incremental_ingest" ->
      """WITH staged AS (SELECT DISTINCT md5(text) AS h
                         FROM documents WHERE doc_id % 5 <> 0),
              inc AS (SELECT lang, md5(text) AS h
                      FROM documents WHERE doc_id % 5 = 0)
         SELECT lang, count(*) AS n_new, count(DISTINCT h) AS n_unique
         FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM staged WHERE staged.h = inc.h)
         GROUP BY lang ORDER BY lang""",
  )
}
