package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the MirroredLsh signature vector
  * (NTables × NBits-bit sign patterns) for an ArrayType(FloatType)
  * embedding, with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §7.3, same rationale as
  * [[CosineSimilarity]]): the ScalaUDF route pays a catalyst→Scala
  * conversion per row — every float boxed into an immutable Seq before
  * the kernel can touch it — and the UDF call sits as an opaque
  * `ScalaUDF` invoke inside the projection. This expression reads the
  * UnsafeArrayData directly (zero boxing) and emits a single static
  * call into [[graft.operators.MirroredLsh.signatureKernel]], so the
  * signature projection stays inside the enclosing WholeStageCodegen
  * stage. The kernel itself is identical index-order arithmetic —
  * bit-for-bit the same signatures, so the DuckDB oracle CTEs
  * ([[graft.operators.MirroredLsh.candidateSqlCtes]]) are unchanged.
  *
  * Null/shape contract: null input → null; an embedding shorter than
  * [[graft.operators.MirroredLsh.Dim]] or containing null elements →
  * null (the UDF form would have thrown — declared fixtures carry
  * exactly 64 non-null floats, so this path is never taken there).
  */
case class LshSignatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_sigs requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_sigs"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.MirroredLsh.signatureKernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.operators.MirroredLsh.signatureKernel($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}
