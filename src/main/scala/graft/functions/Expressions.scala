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

/** Content-anchored window fingerprints for sub-document dedup, fused
  * into one kernel: tokenize (split on single space, trailing empties
  * kept — java split(re, -1), exactly Spark SQL `split(text, ' ')`),
  * md5 each token once to test the anchor condition, md5 each anchored
  * W-token window. Replaces a filter+transform higher-order-function
  * stack that Catalyst evaluates interpreted with a per-index lambda
  * frame AND an md5 expression invocation per token — this is the
  * substring family's entire map-stage cost. Returns
  * array<struct<i INT, whash STRING>> (window start + hex digest), the
  * shape both the detector (ignores i) and the scrub (explodes coverage
  * from i) consume. Bit-identical to the HOF form by construction; the
  * oracle and probe specs pin it.
  */
case class AnchoredWindowHashes(child: Expression, window: Int, anchorHex: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("whash", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"AnchoredWindowHashes needs a string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    AnchoredWindowHashes.compute(v.asInstanceOf[UTF8String], window, anchorHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.AnchoredWindowHashes.compute($c, $window, "$anchorHex")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AnchoredWindowHashes {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((b(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, w: Int, anchors: String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // anchor test per token, each token hashed exactly once
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i <= n - w) {
      if (anchors.indexOf(md5hex(toks(i)).charAt(0)) >= 0) {
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < i + w) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out += org.apache.spark.sql.catalyst.InternalRow(
          i, UTF8String.fromString(md5hex(sb.toString)))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Column-level entry points (Spark 4 classic Column <-> Expression bridge). */
object FastFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def float_dot(a: Column, b: Column): Column = column(FloatDotProduct(expression(a), expression(b)))
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
  def anchored_window_hashes(c: Column, window: Int, anchorHex: String): Column =
    column(AnchoredWindowHashes(expression(c), window, anchorHex))
}
