package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between two
  * ArrayType(FloatType) columns, with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §7.3): the HOF formulation
  * (`aggregate(zip_with(...))`) materializes an intermediate product
  * array and evaluates a lambda per element; this kernel is one fused
  * loop over both arrays computing dot product and both norms in a
  * single pass, inlined into the enclosing WholeStageCodegen stage —
  * no allocation, no virtual calls. Semantics are bit-identical to the
  * HOF form (left-to-right double accumulation), so the DuckDB oracles
  * are unchanged.
  *
  * Float elements are widened to double before any arithmetic
  * (exact), matching the declared-query convention.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true // any containsNull
      case _ => false
    }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null is returned for length-mismatched inputs and null elements,
  // not only for null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null // no silent prefix similarity
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // propagate like the HOF form
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // element null checks are emitted only when the input types can
      // actually hold nulls, so the fixture path keeps the tight loop
      val mayHaveNulls =
        Seq(left, right).exists(_.dataType match {
          case ArrayType(_, cn) => cn
          case _ => true
        })
      val nullCheck =
        if (mayHaveNulls)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions — both the runtime
  * route (register on an existing session) and the
  * SparkSessionExtensions route (spark.sql.extensions=graft.functions.
  * GraftExtensions for cluster-wide installation). */
object GraftFunctions {
  val cosineSimBuilder: Seq[Expression] => Expression =
    exprs => CosineSimilarity(exprs(0), exprs(1))
  val hammingBitsBuilder: Seq[Expression] => Expression =
    exprs => StringHamming(exprs(0), exprs(1))
  val lshSigsBuilder: Seq[Expression] => Expression =
    exprs => LshSignatures(exprs(0))
  val pqCodesBuilder: Seq[Expression] => Expression =
    exprs => PqAssignCodes(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cosine_sim", cosineSimBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("hamming_bits", hammingBitsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("lsh_sigs", lshSigsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("pq_codes", pqCodesBuilder, "built-in")
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      GraftFunctions.cosineSimBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("hamming_bits"),
      new ExpressionInfo(classOf[StringHamming].getName, "hamming_bits"),
      GraftFunctions.hammingBitsBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_sigs"),
      new ExpressionInfo(classOf[LshSignatures].getName, "lsh_sigs"),
      GraftFunctions.lshSigsBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("pq_codes"),
      new ExpressionInfo(classOf[PqAssignCodes].getName, "pq_codes"),
      GraftFunctions.pqCodesBuilder))
    // top-1-per-key windows → min(struct) aggregation (see
    // graft.plans.TopOneToMinStruct for the safety gates)
    ext.injectOptimizerRule(_ => graft.plans.TopOneToMinStruct)
  }
}
