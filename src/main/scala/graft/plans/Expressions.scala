package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot paths (SURVEY.md §7.4:
  * custom `Expression` preferred over UDFs — these participate in
  * whole-stage codegen, so the similarity/dedup kernels run as tight Java
  * loops instead of interpreted higher-order-function folds).
  *
  * Semantics are bit-identical to the HOF formulations they replace (and
  * to the DuckDB oracles): left-to-right double accumulation, md5-hex
  * prefix parsing.
  */
object HashUtil {
  private val mdTl =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 as a 60-bit non-negative long — equal to
    * `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)` but without the
    * hex-string round-trip. */
  def hex60md5(s: UTF8String): Long = {
    val md = mdTl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Dot product of two numeric arrays (float or double elements) as one
  * codegen'd loop; accumulation order is left-to-right, matching
  * `aggregate(zip_with(...))` and DuckDB's `list_reduce`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be array<float> / array<double> columns (AbstractDataType /
  // ExpectsInputTypes are private[sql], so the contract is enforced by use)

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** 60-bit md5-prefix hash of a string — the engine's portable content
  * hash (shared with the DuckDB oracle via the hex-prefix definition). */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HashUtil.hex60md5(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashUtil.hex60md5($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(newChild)
}

/** Session extension registering the native functions for SQL use
  * (`spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_hex60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "graft_hex60"),
      (exprs: Seq[Expression]) => Md5Prefix60(exprs.head)))
  }
}
