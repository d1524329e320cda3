package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two
  * equal-length ASCII strings (the SimHash bit-string comparison),
  * with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §7.3): the HOF formulation
  * (`size(filter(zip_with(split(a,''), split(b,''), ...)))`)
  * materializes TWO per-character string arrays plus a zipped boolean
  * array per comparison — three allocations and per-element lambda
  * calls for what is a byte-compare loop. This kernel is one fused
  * loop over the UTF8 bytes, inlined into the enclosing
  * WholeStageCodegen stage. For 64-bit SimHash signatures the inputs
  * are pure ASCII ('0'/'1'), so byte equality IS character equality.
  * Returns null on length mismatch (no silent prefix distance) —
  * same convention as [[CosineSimilarity]].
  */
case class StringHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hamming_bits requires two string arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_bits"
  override def nullable: Boolean = true // length mismatch → null

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = x.numBytes()
    if (y.numBytes() != n) return null
    var d = 0
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numBytes();
         |if ($b.numBytes() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getByte($i) != $b.getByte($i)) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringHamming =
    copy(left = newLeft, right = newRight)
}
