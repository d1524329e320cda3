package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families (SURVEY.md §2.8): one declared query per
  * family, each a deterministic projection over a fixture table,
  * sampled by a modulus filter on the key and ordered by every output
  * column (ties are then bit-identical rows, so the hash compare is
  * order-safe even where the sample key is not unique — lineitem has
  * real duplicate rows, SURVEY §1.2).
  *
  * DuckDB name/type parity (SURVEY §5.4.5, re-verified this session):
  *   - Spark `split(s,' ')(0)`        → DuckDB `string_split(s,' ')[1]` (1-based)
  *   - Spark `datediff(end,start)`    → `date_diff('day', start, end)` (arg order!)
  *   - Spark `year/month/length/size` return Int → oracle CASTs BIGINT→INTEGER
  *   - Spark `ceil/floor` return Long → oracle CASTs DOUBLE→BIGINT
  *   - Spark `sign` returns Double    → oracle CASTs TINYINT→DOUBLE
  *   - Spark `pmod(a,b)`              → `((a % b) + b) % b`
  *   - date-valued results cast to TIMESTAMP on BOTH sides (date/ts
  *     dtype drift across parquet/pandas is the alternative)
  *   - Spark `nanvl`                  → `CASE WHEN isnan(x) THEN y ELSE x END`
  *   - array HOFs: `transform/filter/aggregate` → `list_transform/
  *     list_filter/list_aggregate(l,'sum')`; element access 1-based in
  *     both (`element_at` / `l[i]`); floats cast to DOUBLE before any
  *     arithmetic (float→double widening is exact in both engines, and
  *     both fold list sums sequentially → identical bits, round(,4)
  *     guards regardless)
  *
  * Scale notes: every query here is scan → filter → project → sort of
  * a modulus sample; the filter and the (narrow) column set push into
  * the parquet scan, nothing shuffles except the final bounded sort.
  * All functions are built-in Catalyst expressions (codegen'd) — no
  * UDFs in any hot path.
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // String family over part: case, trim, length, concat, substring,
    // regex extract/replace, padding, translate, split-and-index.
    "fn_string" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") % 37 === 0)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_brand")).as("up"),
          length(col("p_name")).as("len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
          substring(col("p_name"), 1, 8).as("sub"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
          regexp_replace(col("p_name"), "a", "_").as("rrep"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          translate(col("p_type"), "AEIOU", "aeiou").as("tr"),
          split(col("p_name"), " ").getItem(0).as("tok0"),
          trim(col("p_name")).as("tm"))
        .orderBy("p_partkey")),

    // Decimal family (r7): DecimalType arithmetic AS DATA — the
    // currency path a staging engine meets constantly, and the one
    // type-system hole SURVEY §1.2 conceded. Determinism contract:
    // (a) decimals are constructed from INTEGER-valued columns only —
    // casting an arbitrary double would hit the shortest-repr
    // rounding trap recorded in SURVEY §5.4.2 (Spark rounds the
    // decimal STRING of the double HALF_UP, DuckDB the binary value);
    // (b) every arithmetic result is cast to an EXPLICIT (p,s), so the
    // engines' different precision/scale inference rules never touch a
    // value; (c) all values stay positive, so Spark's HALF_UP round
    // and DuckDB's half-away-from-zero agree on the exact-decimal
    // ties round() does hit (net has genuine scale-4 digits);
    // (d) output columns are VARCHAR/DOUBLE/BIGINT because the driver's
    // pandas compare coerces DECIMAL to object and the hash breaks on
    // equal values (preflight rejects DECIMAL outputs by design) — the
    // VARCHAR column carries the full-scale exact sum, so exactness is
    // still what the hash checks. Scale: pure scan → project →
    // 3-group agg; decimal ops are codegen'd fixed-point arithmetic.
    "fn_decimal" -> ((s, d) => {
      val base = Tables.lineitem(s, d).select(
        col("l_returnflag"),
        col("l_quantity").cast("bigint").cast("decimal(10,2)").as("qty_d"),
        ((col("l_orderkey") % 10000) + col("l_linenumber")).cast("bigint")
          .cast("decimal(12,0)").as("cents_d"),
        (col("l_linenumber").cast("decimal(3,0)") *
          expr("CAST('0.05' AS DECIMAL(3,2))")).cast("decimal(6,2)").as("disc_d"))
      val priced = base.withColumn("price_d",
        (col("cents_d") * expr("CAST('0.01' AS DECIMAL(3,2))"))
          .cast("decimal(14,2)"))
      val net = priced.withColumn("net_x",
        ((col("qty_d") * col("price_d")).cast("decimal(20,4)") *
          (expr("CAST('1.00' AS DECIMAL(5,2))") - col("disc_d")))
          .cast("decimal(26,6)"))
      val r = net.withColumn("net_r",
        round(col("net_x"), 2).cast("decimal(22,2)"))
      r.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("net_r")).cast("decimal(38,2)").cast("string")
            .as("sum_net_str"),
          sum(col("net_r")).cast("double").as("sum_net_dbl"),
          min(col("net_r")).cast("string").as("min_net_str"),
          max(col("net_r")).cast("string").as("max_net_str"),
          sum(col("qty_d")).cast("bigint").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Regex family (beyond fn_string's single extract/replace):
    // extract-all to array, non-overlapping match count, boolean
    // match. Patterns stay in the Java↔RE2 shared subset (character
    // classes + quantifiers, no lookaround/backrefs).
    "fn_regex" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") % 37 === 0)
        .select(
          col("p_partkey"),
          concat_ws(",",
            regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)))
            .as("vruns"),
          regexp_count(col("p_name"), lit("[aeiou]+")).as("nvruns"),
          regexp_count(col("p_name"), lit(" ")).as("nsp"),
          col("p_name").rlike("^[a-z]").as("starts_lower"))
        .orderBy("p_partkey")),

    // Date/time family over orders: parts, trunc, diff, add_months,
    // last_day, epoch seconds. All date-valued outputs cast to
    // timestamp for cross-engine dtype stability.
    "fn_date" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 997 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dd"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("dif"),
          add_months(to_date(col("o_orderdate")), 3).cast("timestamp").as("am"),
          last_day(to_date(col("o_orderdate"))).cast("timestamp").as("ld"),
          unix_timestamp(col("o_orderdate")).as("ep"),
          to_date(col("o_orderdate")).cast("timestamp").as("dt"))
        .orderBy("o_orderkey")),

    // Math family over a lineitem sample.
    "fn_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 499 === 0 && col("l_linenumber") === 1)
        .select(
          col("l_orderkey"),
          round(col("l_extendedprice"), 2).as("r"),
          abs(col("l_discount") - 0.05).as("ab"),
          ceil(col("l_quantity") / 7.0).as("ce"),
          floor(col("l_quantity") / 7.0).as("fl"),
          round(pow(col("l_quantity"), 1.5), 4).as("pw"),
          round(exp(col("l_discount")), 4).as("ex"),
          round(log(col("l_extendedprice")), 4).as("lg"),
          round(log10(col("l_extendedprice")), 4).as("l10"),
          round(sqrt(col("l_quantity")), 4).as("sq"),
          signum(col("l_discount") - 0.05).as("sg"),
          pmod(col("l_orderkey"), lit(7L)).as("pm"),
          greatest(col("l_quantity"), col("l_discount") * 1000).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy("l_orderkey", "r", "ab", "ce", "fl", "pw", "ex", "lg",
          "l10", "sq", "sg", "pm", "gr", "le")),

    // Conditional family over customer: coalesce/nullif/nvl/nanvl.
    // NaN is manufactured deterministically for the nanvl leg.
    "fn_conditional" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0)
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
            .as("seg"),
          nullif(col("c_nationkey"), lit(5)).as("nk"),
          round(nanvl(
            when(col("c_acctbal") < 0, lit(Double.NaN))
              .otherwise(col("c_acctbal")),
            lit(0.0)), 4).as("bal_nn"),
          nvl(nullif(col("c_mktsegment"), col("c_mktsegment")), lit("same"))
            .as("nv"),
          when(col("c_acctbal") > 5000, "high")
            .when(col("c_acctbal") > 0, "mid")
            .otherwise("low").as("band"))
        .orderBy("c_custkey")),

    // Array family + higher-order functions over embeddings
    // (ArrayType(FloatType), 64-dim): size, fold-sum, min, filter
    // count, slice+index, distinct count.
    "fn_array" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") % 37 === 0)
        .select(
          col("vec_id"),
          size(col("embedding")).as("n"),
          round(expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (a, x) -> a + x)"
          ), 4).as("ssum"),
          round(array_min(col("embedding")).cast("double"), 4).as("mn"),
          size(expr("filter(embedding, x -> x > 0)")).as("npos"),
          round(element_at(slice(col("embedding"), 1, 3), 2).cast("double"), 4)
            .as("e2"),
          size(array_distinct(col("embedding"))).as("ndist"))
        .orderBy("vec_id")),

    // Encoding family: base64, hex, byte length, md5/sha2 digests —
    // all over utf8 bytes of string columns (byte-identical in both
    // engines, SURVEY §5.4.5).
    // Deterministic ID minting (r7) — the UUIDv5 pattern (name-based,
    // md5) a pipeline uses so re-runs mint the SAME id for the same
    // record (content-addressed identity; random UUIDs would break
    // idempotent re-ingestion): namespace-prefixed md5, formatted as
    // 8-4-4-4-12 with the version nibble forced to 5. Pure codegen
    // projection; the nibble histogram in fn-level keys proves
    // hash-bucket uniformity is preserved by the formatting.
    "fn_deterministic_id" -> ((s, d) => {
      val h = md5(concat(lit("graft:doc:"), col("doc_id").cast("string")))
      Tables.documents(s, d)
        .filter(col("doc_id") % 199 === 0)
        .select(col("doc_id"),
          concat_ws("-",
            substring(h, 1, 8), substring(h, 9, 4),
            concat(lit("5"), substring(h, 14, 3)),
            substring(h, 17, 4), substring(h, 21, 12)).as("uuid5"),
          substring(h, 1, 1).as("bucket_nibble"))
        .orderBy("doc_id")
    }),

    "fn_encoding" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") % 37 === 0)
        .select(
          col("p_partkey"),
          base64(col("p_brand").cast("binary")).as("b64"),
          hex(col("p_type").cast("binary")).as("hx"),
          length(col("p_name").cast("binary")).as("nbytes"),
          md5(col("p_name")).as("m5"),
          sha2(col("p_brand"), 256).as("s256"))
        .orderBy("p_partkey")),

    // Formatting family (§2.8 tenth): printf-style templating plus
    // pad/repeat/reverse. Patterns stay in the Java↔C printf shared
    // subset (%d, %0Nd, %s) — float patterns like %.2f are EXCLUDED
    // because Java rounds HALF_UP where C rounds half-even, which
    // would diverge on .xx5 inputs.
    "fn_formatting" -> ((s, d) =>
      Tables.nation(s, d)
        .select(
          col("n_nationkey"),
          format_string("%05d:%s", col("n_nationkey"), col("n_name")).as("tag"),
          lpad(col("n_name"), 12, ".").as("lp"),
          rpad(col("n_name"), 12, "_").as("rp"),
          repeat(substring(col("n_name"), 1, 2), 3).as("rep"),
          reverse(col("n_name")).as("rev"))
        .orderBy("n_nationkey")),

    // Native collation (r12) — Spark 4's COLLATE support: grouping
    // and equality under UTF8_LCASE without rewriting expressions to
    // lower() at every use site (the collation travels WITH the
    // column through the plan — the catalog-level fix for
    // case-insensitive business keys). Corpus is case-mangled
    // deterministically (even doc_id → UPPER) so every frequent word
    // genuinely spans 2 case variants; grouping on the collated
    // column must fuse them. UTF8_LCASE == lower()-equivalence on
    // this pure-ASCII fixture, which is exactly what lets DuckDB
    // mirror it; output keys are lower()-projected (a collated
    // group's representative case is undeclared — never output it
    // raw). Top-20 by (count DESC, word) — a total pick order.
    "fn_collation_group" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w0"))
        .select(when(col("doc_id") % 2 === 0, upper(col("w0")))
          .otherwise(col("w0")).as("w"))
      // r15 (guide §2.3 aggregate before you shuffle): pre-aggregate
      // on the BINARY key first — the token-grain hash aggregate runs
      // with cheap binary equality and map-side partials, so only the
      // exact-case VOCABULARY (not every token) reaches the collated
      // aggregate, whose UTF8_LCASE hashing/equality is the expensive
      // comparator. n = Σ per-case counts and n_case_variants =
      // count of distinct binary keys per collated group — identical
      // values, one collated row per surviving vocab entry instead of
      // per token (measured 2.62 → ~1.9 s at sf0.1).
      tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .groupBy(expr("collate(w, 'UTF8_LCASE')").as("wc"))
        .agg(sum(col("cnt")).as("n"),
          count(lit(1)).as("n_case_variants"))
        .select(lower(col("wc")).as("word"), col("n"),
          col("n_case_variants"))
        .orderBy(col("n").desc, col("word")).limit(20)
        .orderBy("word")
    }),

    // Struct family: named_struct construction, field access, struct
    // round-trip through an array element.
    "fn_struct" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 997 === 0)
        .select(
          col("o_orderkey"),
          struct(col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
            .as("os"),
          round(col("o_totalprice"), 2).as("tp"))
        .select(
          col("o_orderkey"),
          col("os.st").as("st2"),
          col("os.pr").as("pr2"),
          element_at(array(struct(col("o_orderkey").as("k"), col("tp").as("p"))), 1)
            .getField("p").as("price2"))
        .orderBy("o_orderkey")),

    // Map/JSON family over events.props (JSON-encoded {"k": <int>}):
    // path extraction and from_json→map access agree with the oracle's
    // ->> extraction.
    // URL component extraction (round 6) — the parsing companion of
    // `dedup_url_canonical` (same synthesized URL corpus): host,
    // path, and a query parameter via anchored regexp_extract. The
    // regexes are shared verbatim with the DuckDB oracle, so parity
    // is by construction (Spark's parse_url would also work but has
    // no DuckDB twin — regexp is the cross-engine form, and both
    // engines run RE2-class patterns here). Pure codegen'd
    // projection, no shuffle before the aggregate.
    "fn_url_extract" -> ((s, d) => {
      val url = concat(lit("https://www.example"), col("doc_id") % 7,
        lit(".com/path"), col("doc_id") % 50,
        lit("/page?utm_source=feed&ref="), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("url", url)
        .select(
          regexp_extract(col("url"), "^https?://([^/]+)/", 1).as("host"),
          regexp_extract(col("url"), "^https?://[^/]+(/[^?]*)", 1).as("path"),
          regexp_extract(col("url"), "[?&]ref=([^&]*)", 1).as("ref"))
        .groupBy("host")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("path")).as("n_paths"),
          min(col("ref")).as("min_ref"),
          max(col("ref")).as("max_ref"))
        .orderBy("host")
    }),

    // Spark 4 VARIANT (round 6): the engine's semi-structured path —
    // parse_json builds the binary-encoded open type, variant_get
    // extracts typed fields by path. At 100 TB VARIANT replaces
    // string-JSON scans: the binary encoding skips re-parsing per
    // access and (with shredding) pushes field extraction into the
    // scan. Declared as a round-trip: struct → JSON text → VARIANT →
    // typed fields; the oracle selects the ORIGINAL columns, so the
    // whole encode/decode chain must be lossless (doubles survive via
    // shortest-repr JSON printing, which both engines re-read
    // bit-exactly).
    "fn_variant" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"),
          parse_json(to_json(struct(
            col("c_name").as("name"),
            col("c_acctbal").as("bal"),
            col("c_mktsegment").as("seg")))).as("v"))
        .select(col("c_custkey"),
          expr("variant_get(v, '$.name', 'string')").as("name"),
          // the JSON number parses to DECIMAL(p,2) inside the variant;
          // the typed get widens to double — exact for 2-decimal data
          expr("variant_get(v, '$.bal', 'double')").as("bal"),
          expr("variant_get(v, '$.seg', 'string')").as("seg"))
        .orderBy("c_custkey")),

    "fn_map_json" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") % 97 === 0)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_json"),
          element_at(
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)), "k").as("k_map"),
          size(map_keys(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)))).as("nkeys"))
        .orderBy("event_id")),
  )

  val oracles: Map[String, String] = Map(
    "fn_collation_group" ->
      """WITH tok AS (SELECT doc_id,
                             unnest(string_split(text, ' ')) AS w0
                      FROM documents),
              m AS (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(w0)
                                ELSE w0 END AS w
                    FROM tok),
              g AS (SELECT lower(w) AS word, count(*) AS n,
                           count(DISTINCT w) AS n_case_variants
                    FROM m GROUP BY lower(w))
         SELECT word, n, n_case_variants
         FROM (SELECT *, row_number() OVER (ORDER BY n DESC, word) AS rn
               FROM g)
         WHERE rn <= 20 ORDER BY word""",
    "fn_decimal" ->
      """WITH base AS (
           SELECT l_returnflag,
                  CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(10,2)) AS qty_d,
                  CAST(CAST((l_orderkey % 10000) + l_linenumber AS BIGINT)
                       AS DECIMAL(12,0)) AS cents_d,
                  CAST(CAST(l_linenumber AS DECIMAL(3,0))
                       * CAST('0.05' AS DECIMAL(3,2)) AS DECIMAL(6,2)) AS disc_d
           FROM lineitem),
         priced AS (
           SELECT l_returnflag, qty_d, disc_d,
                  CAST(cents_d * CAST('0.01' AS DECIMAL(3,2))
                       AS DECIMAL(14,2)) AS price_d
           FROM base),
         net AS (
           SELECT l_returnflag, qty_d,
                  CAST(CAST(qty_d * price_d AS DECIMAL(20,4))
                       * (CAST('1.00' AS DECIMAL(5,2)) - disc_d)
                       AS DECIMAL(26,6)) AS net_x
           FROM priced),
         r AS (
           SELECT l_returnflag, qty_d,
                  CAST(round(net_x, 2) AS DECIMAL(22,2)) AS net_r
           FROM net)
         SELECT l_returnflag,
                count(*) AS n,
                CAST(CAST(sum(net_r) AS DECIMAL(38,2)) AS VARCHAR)
                  AS sum_net_str,
                CAST(sum(net_r) AS DOUBLE) AS sum_net_dbl,
                CAST(min(net_r) AS VARCHAR) AS min_net_str,
                CAST(max(net_r) AS VARCHAR) AS max_net_str,
                CAST(sum(qty_d) AS BIGINT) AS sum_qty
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",
    "fn_regex" ->
      """SELECT p_partkey,
                array_to_string(regexp_extract_all(p_name, '[aeiou]+'), ',')
                  AS vruns,
                CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT)
                  AS nvruns,
                CAST(len(regexp_extract_all(p_name, ' ')) AS INT) AS nsp,
                regexp_matches(p_name, '^[a-z]') AS starts_lower
         FROM part WHERE p_partkey % 37 = 0 ORDER BY p_partkey""",
    "fn_string" ->
      """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up,
                CAST(length(p_name) AS INTEGER) AS len,
                concat_ws('|', p_brand, p_type) AS cat,
                substring(p_name, 1, 8) AS sub,
                regexp_extract(p_name, '([a-z]+)', 1) AS rex,
                regexp_replace(p_name, 'a', '_', 'g') AS rrep,
                lpad(p_brand, 12, '*') AS lp,
                translate(p_type, 'AEIOU', 'aeiou') AS tr,
                string_split(p_name, ' ')[1] AS tok0,
                trim(p_name) AS tm
         FROM part WHERE p_partkey % 37 = 0 ORDER BY p_partkey""",
    "fn_date" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INTEGER) AS y,
                CAST(month(o_orderdate) AS INTEGER) AS m,
                CAST(day(o_orderdate) AS INTEGER) AS dd,
                date_trunc('month', o_orderdate) AS mon,
                CAST(date_diff('day', DATE '1995-01-01',
                               CAST(o_orderdate AS DATE)) AS INTEGER) AS dif,
                CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                     AS TIMESTAMP) AS am,
                CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS ld,
                CAST(epoch(o_orderdate) AS BIGINT) AS ep,
                CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS dt
         FROM orders WHERE o_orderkey % 997 = 0 ORDER BY o_orderkey""",
    "fn_math" ->
      """SELECT l_orderkey,
                round(l_extendedprice, 2) AS r,
                abs(l_discount - 0.05) AS ab,
                CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
                CAST(floor(l_quantity / 7.0) AS BIGINT) AS fl,
                round(pow(l_quantity, 1.5), 4) AS pw,
                round(exp(l_discount), 4) AS ex,
                round(ln(l_extendedprice), 4) AS lg,
                round(log10(l_extendedprice), 4) AS l10,
                round(sqrt(l_quantity), 4) AS sq,
                CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
                ((l_orderkey % 7) + 7) % 7 AS pm,
                greatest(l_quantity, l_discount * 1000) AS gr,
                least(l_tax, l_discount) AS le
         FROM lineitem WHERE l_orderkey % 499 = 0 AND l_linenumber = 1
         ORDER BY l_orderkey, r, ab, ce, fl, pw, ex, lg, l10, sq, sg, pm, gr, le""",
    "fn_conditional" ->
      """SELECT c_custkey,
                coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
                nullif(c_nationkey, 5) AS nk,
                round(CASE WHEN isnan(CASE WHEN c_acctbal < 0 THEN CAST('NaN' AS DOUBLE)
                                           ELSE c_acctbal END)
                           THEN 0.0
                           ELSE CASE WHEN c_acctbal < 0 THEN CAST('NaN' AS DOUBLE)
                                     ELSE c_acctbal END END, 4) AS bal_nn,
                coalesce(nullif(c_mktsegment, c_mktsegment), 'same') AS nv,
                CASE WHEN c_acctbal > 5000 THEN 'high'
                     WHEN c_acctbal > 0 THEN 'mid'
                     ELSE 'low' END AS band
         FROM customer WHERE c_custkey % 97 = 0 ORDER BY c_custkey""",
    "fn_array" ->
      """SELECT vec_id,
                CAST(len(embedding) AS INTEGER) AS n,
                round(list_aggregate(
                        list_transform(embedding, x -> CAST(x AS DOUBLE)),
                        'sum'), 4) AS ssum,
                round(CAST(list_sort(embedding)[1] AS DOUBLE), 4) AS mn,
                CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS npos,
                round(CAST(list_slice(embedding, 1, 3)[2] AS DOUBLE), 4) AS e2,
                CAST(len(list_distinct(embedding)) AS INTEGER) AS ndist
         FROM embeddings WHERE vec_id % 37 = 0 ORDER BY vec_id""",
    "fn_deterministic_id" ->
      """WITH h AS (SELECT doc_id,
                           md5('graft:doc:' || CAST(doc_id AS VARCHAR)) AS m
                    FROM documents WHERE doc_id % 199 = 0)
         SELECT doc_id,
                substr(m, 1, 8) || '-' || substr(m, 9, 4) || '-'
                  || '5' || substr(m, 14, 3) || '-' || substr(m, 17, 4)
                  || '-' || substr(m, 21, 12) AS uuid5,
                substr(m, 1, 1) AS bucket_nibble
         FROM h ORDER BY doc_id""",
    "fn_encoding" ->
      """SELECT p_partkey,
                base64(encode(p_brand)) AS b64,
                hex(encode(p_type)) AS hx,
                CAST(octet_length(encode(p_name)) AS INTEGER) AS nbytes,
                md5(p_name) AS m5,
                sha256(p_brand) AS s256
         FROM part WHERE p_partkey % 37 = 0 ORDER BY p_partkey""",
    "fn_formatting" ->
      """SELECT n_nationkey,
                printf('%05d:%s', n_nationkey, n_name) AS tag,
                lpad(n_name, 12, '.') AS lp,
                rpad(n_name, 12, '_') AS rp,
                repeat(substring(n_name, 1, 2), 3) AS rep,
                reverse(n_name) AS rev
         FROM nation ORDER BY n_nationkey""",
    "fn_struct" ->
      """SELECT o_orderkey,
                struct_pack(st := o_orderstatus, pr := o_orderpriority).st AS st2,
                struct_pack(st := o_orderstatus, pr := o_orderpriority).pr AS pr2,
                [{'k': o_orderkey, 'p': round(o_totalprice, 2)}][1].p AS price2
         FROM orders WHERE o_orderkey % 997 = 0 ORDER BY o_orderkey""",
    "fn_map_json" ->
      """SELECT event_id,
                CAST(props->>'$.k' AS INTEGER) AS k_json,
                CAST(props->>'$.k' AS INTEGER) AS k_map,
                1 AS nkeys
         FROM events WHERE event_id % 97 = 0 ORDER BY event_id""",
    "fn_url_extract" ->
      """WITH u AS (SELECT 'https://www.example' || (doc_id % 7)
                           || '.com/path' || (doc_id % 50)
                           || '/page?utm_source=feed&ref=' || doc_id AS url
                    FROM documents),
              x AS (SELECT regexp_extract(url, '^https?://([^/]+)/', 1)
                             AS host,
                           regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1)
                             AS path,
                           regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
                    FROM u)
         SELECT host, count(*) AS n,
                count(DISTINCT path) AS n_paths,
                min(ref) AS min_ref, max(ref) AS max_ref
         FROM x GROUP BY host ORDER BY host""",
    "fn_variant" ->
      """SELECT c_custkey, c_name AS name,
                CAST(c_acctbal AS DOUBLE) AS bal, c_mktsegment AS seg
         FROM customer WHERE c_custkey % 50 = 0 ORDER BY c_custkey""",
  )
}
