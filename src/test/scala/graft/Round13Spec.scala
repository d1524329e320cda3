package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: the Spark 4 SQL-surface closers — pipe-operator
  * queries and SQL-body UDFs. Both specs pin the property that makes
  * the surface free at 100 TB: each desugars/inlines onto the SAME
  * optimized plan the classic formulation gets, so no new operator,
  * serialization boundary, or codegen break enters the pipeline.
  */
class Round13Spec extends GraftSuite {

  test("sql_pipe_syntax: the |> chain desugars onto the classic " +
      "query's optimized plan (sameResult) and returns identical rows") {
    val pipe = SparkEntry.queries("sql_pipe_syntax")(spark, sf)
    // view registered by the key; the classic text is the oracle's
    val classic = spark.sql(graft.operators.Subqueries.sqlPipeClassic)
    assert(pipe.queryExecution.optimizedPlan
      .sameResult(classic.queryExecution.optimizedPlan),
      "pipe chain did not desugar onto the classic plan:\n" +
        s"pipe:\n${pipe.queryExecution.optimizedPlan}\n" +
        s"classic:\n${classic.queryExecution.optimizedPlan}")
    assert(pipe.collect().toSeq == classic.collect().toSeq)
    // the multi-stage chain still pushes the WHERE into the scan and
    // keeps partial aggregation (the stages are syntax, not barriers)
    val phys = pipe.queryExecution.executedPlan.toString
    assert(phys.contains("partial_"),
      s"pipe aggregate lost map-side partials:\n$phys")
    assert(phys.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,5.0)]"),
      s"pipe WHERE did not reach the parquet scan:\n$phys")
  }

  test("fn_sql_udf: SQL-body UDFs inline into the plan — zero ScalaUDF " +
      "nodes, bodies visible in whole-stage codegen spans") {
    val df = SparkEntry.queries("fn_sql_udf")(spark, sf)
    df.collect()
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("ScalaUDF") && !phys.contains("BatchEvalPython"),
      s"SQL UDF did not inline — a UDF node survived:\n$phys")
    // AQE's executed-plan toString renders whole-stage-codegen spans
    // as "*(n)" stage prefixes; the aggregate carrying the inlined
    // body must sit inside one
    assert(phys.contains("*(1) HashAggregate"),
      s"inlined plan lost whole-stage codegen on the aggregate:\n$phys")
    // the arithmetic body participates in PARTIAL aggregation — the
    // map-side combine a closure UDF inside an agg would also get,
    // but here the expression itself is codegen'd, not invoked
    assert(phys.contains("partial_sum"),
      s"inlined aggregate lost map-side partials:\n$phys")
    // result equals the hand-inlined formulation
    val want = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"),
        when(col("l_extendedprice") < 20000, "low")
          .when(col("l_extendedprice") < 50000, "mid")
          .otherwise("high").as("band"))
      .agg(count(lit(1)).as("n"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 4).as("revenue"))
      .orderBy("l_returnflag", "band")
    assert(df.collect().toSeq == want.collect().toSeq)
  }
}
