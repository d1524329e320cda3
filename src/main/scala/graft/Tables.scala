package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loaders for the driver-generated fixtures
  * (see TESTDATA.md). All `SparkEntry.queries` closures read their
  * inputs through here so that:
  *
  *   - the ns-timestamp landmine in `events.parquet` (parquet
  *     `INT64 TIMESTAMP(NANOS)`, which Spark 4.x refuses to read by
  *     default) is handled in exactly one place, and
  *   - at 100 TB scale the load path is a single choke-point where
  *     bucketing / table-format options would be introduced.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes
  * predicates and prunes columns into the `FileScan parquet`, so the
  * operators built on top stay scan-efficient regardless of table
  * size. No caching/collect happens here.
  */
object Tables {

  /** Read one fixture table. `sfDir` is e.g. /root/testdata/sf0.01 */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS,false).
    * Spark 4.1 throws [PARQUET_TYPE_ILLEGAL] on it unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces the
    * column as LongType nanoseconds-since-epoch. We convert to a
    * microsecond TimestampType with *integer* division (`div`) so the
    * truncation is exact — a double-precision divide would lose
    * low-order bits at 1.7e18 ns. DuckDB reading the same file also
    * truncates ns → µs, so both engines hold identical values.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Raw events with ts left as Long nanoseconds (for ops that want
    * the exact value, e.g. fingerprinting). */
  def eventsRawNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
  }
}
