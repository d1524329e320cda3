package graft

import org.apache.spark.sql.functions._

/** Round-12 additions outside the graph-ANN family (which has its own
  * Similarity3Spec): the XML staging roundtrip.
  */
class Round12Spec extends GraftSuite {

  test("scan_xml_roundtrip: sink writes real rowTag XML; readback " +
      "fingerprint matches the parquet-direct aggregate") {
    val got = SparkEntry.queries("scan_xml_roundtrip")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // the part files are actual XML documents with the declared tags
    val dir = new java.io.File("/tmp/graft_scratch/graft_xml_")
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty)
    assert(parts.forall(_.getName.endsWith(".xml")),
      s"expected .xml parts, got ${parts.map(_.getName).toSeq}")
    val text = new String(
      java.nio.file.Files.readAllBytes(parts.head.toPath), "UTF-8")
    assert(text.contains("<customer>") && text.contains("<c_custkey>"),
      "part file does not contain the declared rowTag/element structure")
    // the roundtrip must lose nothing: same per-nation fingerprint as
    // aggregating the parquet table directly (no XML in the loop)
    val want = Tables.customer(spark, sf)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 4)
          .as("total"))
      .orderBy("c_nationkey")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq,
      "XML roundtrip fingerprint diverged from the parquet source")
  }
}
