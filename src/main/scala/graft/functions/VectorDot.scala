package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) walks
  * both arrays through generic higher-order-function plumbing and
  * materializes the products array per row-pair; this expression compiles
  * to a tight fused multiply-add loop inside whole-stage codegen — the
  * kernel under every cosine in `operators/Similarity` (at 100 TB of
  * candidate pairs the difference is the job).
  *
  * Accumulation is sequential left-to-right, exactly like the
  * `aggregate()` fold it replaces, so results are bit-identical and the
  * DuckDB oracle comparisons are unaffected.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  /** True when either input's element type is declared nullable — only
    * then does the kernel pay a per-element null check (a null element
    * or a length mismatch raises instead of silently producing a wrong
    * dot product).
    */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _               => false
  })

  private def raiseBadInput(xs: Int, ys: Int): Nothing =
    throw new IllegalArgumentException(
      s"vector_dot: length mismatch ($xs vs $ys)")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) raiseBadInput(n, y.numElements())
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i)))
        throw new IllegalArgumentException(s"vector_dot: null element at index $i")
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // null-element guard only compiled in when the schema says elements
      // can be null — the common containsNull=false path stays a tight FMA loop
      val nullGuard =
        if (elementsNullable)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) {
             |  throw new IllegalArgumentException("vector_dot: null element at index " + $i);
             |}""".stripMargin
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector_dot: length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      VectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
