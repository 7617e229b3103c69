package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two per-row text algorithms that
  * genuinely can't be composed from column combinators (simhash
  * bit-voting, n-gram language id). Per the engine's extension order
  * (SURVEY §2.6): a native `Expression` with `doGenCode` beats a Scala
  * UDF — these inline a direct static call into whole-stage codegen, with
  * framework-managed null handling and no encoder round-trip or closure
  * serialization. The Scala-object static forwarders
  * (`graft.functions.TextFunctions.simhash64/languageOf`) are the codegen
  * call targets, so interpreted eval and generated code share one
  * implementation.
  */
object NativeExpressions {

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash64 needs a string child, got ${child.dataType}")
    }
    override protected def nullSafeEval(input: Any): Any =
      TextFunctions.simhash64(input.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextFunctions.simhash64($c.toString())")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
    override def prettyName: String = "graft_simhash64"
  }

  case class LangId(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_langid needs a string child, got ${child.dataType}")
    }
    override protected def nullSafeEval(input: Any): Any =
      UTF8String.fromString(
        TextFunctions.languageOf(input.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.TextFunctions.languageOf($c.toString()))")
    override protected def withNewChildInternal(newChild: Expression): LangId =
      copy(child = newChild)
    override def prettyName: String = "graft_langid"
  }

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def langId(text: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text)))
}
