package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  /** MinHash signature over a shingle-hash array — the third per-row
    * algorithm worth a native expression: the HOF formulation
    * (aggregate × zip_with) evaluates an interpreted lambda and allocates a
    * fresh accumulator array per shingle, and measured as the single most
    * expensive stage in the bench. This expression runs the
    * [[MinHashImpl.signature]] tight loop (one XXH64.hashLong + compare per
    * (shingle, index)) and produces bit-identical output to the HOF (law in
    * ApproxOpsSpec).
    */
  case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_minhash_sig needs an array<bigint> child, got $other")
      }
    override protected def nullSafeEval(input: Any): Any =
      MinHashImpl.signature(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.MinHashImpl.signature($c, $numHashes)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** Hashed w-shingle sequence over a token array — companion to
    * [[MinHashSig]] covering the other interpreted-HOF hot stage of the
    * dedup family (per-window slice + concat_ws + xxhash64). Bit-identical
    * to the HOF formulation (law in ApproxOpsSpec); the token array itself
    * still comes from codegen'd split/filter/lower.
    */
  case class ShingleHashes(child: Expression, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_shingle_hashes needs an array<string> child, got $other")
      }
    override protected def nullSafeEval(input: Any): Any =
      MinHashImpl.shingleHashes(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.MinHashImpl.shingleHashes($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
    override def prettyName: String = "graft_shingle_hashes"
  }

  private def elemTag(dt: DataType): Option[Int] = dt match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _)   => Some(VectorImpl.TFloat)
    case ArrayType(org.apache.spark.sql.types.DoubleType, _)  => Some(VectorImpl.TDouble)
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) => Some(VectorImpl.TInt)
    case ArrayType(LongType, _)                               => Some(VectorImpl.TLong)
    case ArrayType(org.apache.spark.sql.types.ByteType, _)    => Some(VectorImpl.TByte)
    case _                                                    => None
  }

  /** Native dot product over two numeric array columns — the vector family's
    * hot kernel (every similarity/embedding-dedup op, and lshBucket runs
    * nBits of these per row). Same left-to-right fold as the HOF
    * formulation, so results are bit-identical (law in ApproxOpsSpec).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = true
    private lazy val (ta, tb) = (elemTag(left.dataType).get, elemTag(right.dataType).get)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (elemTag(left.dataType).isDefined && elemTag(right.dataType).isDefined)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs numeric array children, got ${left.dataType} / ${right.dataType}")
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorImpl.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], ta,
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], tb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dotRes")
        s"""java.lang.Double $r = graft.functions.VectorImpl.dot($a, $ta, $b, $tb);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot"
  }

  /** Native sum of squares over a numeric array column (the norm kernel). */
  case class SumSquares(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = true
    private lazy val ta = elemTag(child.dataType).get
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (elemTag(child.dataType).isDefined)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sumsq needs a numeric array child, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      VectorImpl.sumSquares(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], ta)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val r = ctx.freshName("ssRes")
        s"""java.lang.Double $r = graft.functions.VectorImpl.sumSquares($c, $ta);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
           |""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): SumSquares =
      copy(child = newChild)
    override def prettyName: String = "graft_sumsq"
  }

  /** Intersection size of two sorted, distinct array<bigint> columns —
    * linear merge, count-equal to size(array_intersect) on such inputs
    * (callers sort once per document; see VectorImpl.sortedIntersectCount).
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_sorted_intersect_count needs array<bigint> children, got $other")
      }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorImpl.sortedIntersectCount(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VectorImpl.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
    override def prettyName: String = "graft_sorted_intersect_count"
  }

  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  def langId(text: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text)))

  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))

  def shingleHashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), w))

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sumSquares(a: Column): Column =
    ColumnBridge.column(SumSquares(ColumnBridge.expression(a)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
