package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Link-graph authority scoring (SURVEY.md §2.11, round 6).
  *
  * `graph_pagerank` runs a fixed-iteration PageRank over the bipartite
  * part↔supplier supply graph (distinct lineitem pairs, sampled) — the
  * curation use case is crawl-graph authority as a document-quality
  * prior (CommonCrawl-style pipelines rank hosts by centrality before
  * sampling). The fixture graph is a stand-in; the plan shape is the
  * real thing.
  *
  * Scale notes (100 TB):
  *   - each iteration is ONE shuffle: contributions (dst, pr/deg)
  *     hash-aggregate on dst; the edge list never moves after its
  *     initial distinct. This is the canonical distributed PageRank
  *     shape (map contributions / reduce by destination).
  *   - the edge⋈rank join is src-keyed; on a cluster both sides
  *     co-partition on src and the degree table rides the same join.
  *     Identical edge subplans across the 3 unrolled iterations
  *     dedupe via Spark's exchange reuse.
  *   - iterations are FIXED (3), not convergence-driven: no per-round
  *     driver action at all — the whole ranking is one lazy plan (for
  *     convergence-driven variants see Clustering.components' fused
  *     fixpoint pattern).
  *
  * Determinism (SURVEY §5.4): contributions pr/deg are divisions of
  * identical double bits; each term is quantized to DECIMAL(28,10)
  * before the sum (order-independent); the damped update
  * 0.15 + 0.85·sum runs on identical doubles. The oracle unrolls the
  * same 3 iterations as CTEs, digit-for-digit.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** 3 fixed PageRank iterations over symmetric (src, dst) edges.
    * Returns (node, pr) for every node. */
  private[graft] def pagerank3(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(outdeg, "src")
    var pr = edges.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1.0))
    for (_ <- 1 to 3) {
      pr = withDeg.join(pr, col("src") === col("node"))
        .select(col("dst"),
          (col("pr") / col("deg")).cast("decimal(28,10)").as("c"))
        .groupBy("dst")
        .agg((lit(0.15) + lit(0.85) * sum(col("c")).cast("double")).as("pr"))
        .select(col("dst").as("node"), col("pr"))
    }
    pr
  }

  val queries: Map[String, Q] = Map(
    // Authority top-20 over the sampled part↔supplier graph. Node ids
    // disambiguate the two key spaces (part → 2k, supplier → 2k+1).
    "graph_pagerank" -> ((s, d) => {
      val pairs = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 20 === 0)
        .select((col("l_partkey") * 2).as("pn"),
          (col("l_suppkey") * 2 + 1).as("sn"))
        .distinct()
      val edges = pairs.select(col("pn").as("src"), col("sn").as("dst"))
        .union(pairs.select(col("sn").as("src"), col("pn").as("dst")))
      pagerank3(edges)
        .select(col("node"),
          when(col("node") % 2 === 0, lit("part"))
            .otherwise(lit("supplier")).as("kind"),
          (floor(col("pr") * 10000).cast("double") / 10000.0).as("pr4"))
        .orderBy(col("pr4").desc, col("node"))
        .limit(20)
    }),
  )

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey * 2 AS pn,
                               l_suppkey * 2 + 1 AS sn
                        FROM lineitem WHERE l_partkey % 20 = 0),
              ed AS (SELECT pn AS src, sn AS dst FROM pairs
                     UNION ALL SELECT sn, pn FROM pairs),
              deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
              p0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS pr
                     FROM ed),
              p1 AS (SELECT dst AS node,
                            CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                              * CAST(sum(CAST(p.pr / deg.deg
                                  AS DECIMAL(28,10))) AS DOUBLE) AS pr
                     FROM ed JOIN p0 p ON ed.src = p.node
                             JOIN deg ON deg.src = ed.src
                     GROUP BY dst),
              p2 AS (SELECT dst AS node,
                            CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                              * CAST(sum(CAST(p.pr / deg.deg
                                  AS DECIMAL(28,10))) AS DOUBLE) AS pr
                     FROM ed JOIN p1 p ON ed.src = p.node
                             JOIN deg ON deg.src = ed.src
                     GROUP BY dst),
              p3 AS (SELECT dst AS node,
                            CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                              * CAST(sum(CAST(p.pr / deg.deg
                                  AS DECIMAL(28,10))) AS DOUBLE) AS pr
                     FROM ed JOIN p2 p ON ed.src = p.node
                             JOIN deg ON deg.src = ed.src
                     GROUP BY dst)
         SELECT node,
                CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END
                  AS kind,
                CAST(floor(pr * 10000) AS DOUBLE) / 10000 AS pr4
         FROM p3 ORDER BY pr4 DESC, node LIMIT 20""",
  )
}
