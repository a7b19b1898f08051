package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen'd Catalyst expressions for the two hot scalar kernels.
  * Both are drop-in replacements for higher-order-function formulations and
  * preserve their exact arithmetic (strict left-to-right double / modular
  * fold), so DuckDB-oracle hashes are unchanged — only the per-row lambda
  * interpretation overhead is gone (the HOF forms allocate a lambda frame
  * per element; these compile to a tight loop inside WholeStageCodegen).
  */

/** dot(a, b) over two ARRAY<FLOAT> columns, accumulated left-to-right in
  * double — identical to
  * aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +).
  */
case class FloatDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"FloatDotProduct needs two array<float> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = math.min(xs.numElements(), ys.numElements())
    while (i < n) { s += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble; i += 1 }
    s
  }

  // getFloat(i) reads straight out of the (unsafe) array buffer — no
  // per-row float[] copies; at 10^8 scored pairs the two toFloatArray()
  // copies per row were pure GC pressure
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash over a string's codepoints:
  * fold(h = 0)(h * 31 + cp) mod 1e9+7 — identical to
  * aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))),
  *           0L, (h, c) -> (h*31+c) % 1000000007).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"RollingHash needs a string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    RollingHash.hash(v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    val it = s.codePoints().iterator()
    while (it.hasNext) { h = (h * 31L + it.nextInt()) % Mod }
    h
  }
}

/** Column-level entry points (Spark 4 classic Column <-> Expression bridge). */
object FastFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def float_dot(a: Column, b: Column): Column = column(FloatDotProduct(expression(a), expression(b)))
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
}
