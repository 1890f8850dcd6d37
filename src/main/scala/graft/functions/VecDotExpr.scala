package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.GraftBridge

/** Native Catalyst dot product over numeric array columns.
  *
  * The composed form `aggregate(zip_with(a, b, *), 0.0, +)` is a
  * higher-order-function chain: interpreted lambda dispatch with boxed
  * doubles and a zipped intermediate array PER ROW — the dominant cost of
  * every vector operator (brute-force/LSH/IVF ANN, cosine dedup) once the
  * candidate set is large. This single node reads both arrays' primitive
  * storage directly and generates one straight-line loop under
  * WholeStageCodegen. Accumulation is sequential in index order, exactly
  * like the HOF fold it replaces, so results are bit-identical and the
  * DuckDB oracles are unaffected.
  *
  * Accepts array<float> and array<double> on either side (floats widen to
  * double per element — exact). Exactly replicates the HOF fold's null
  * semantics so the VecDotRewrite optimizer rule is substitution-safe:
  * null ARRAY inputs propagate null; a null ELEMENT nulls the whole sum
  * (Multiply/Add null propagation through the fold); unequal lengths null
  * the sum (zip_with pads the shorter side with nulls).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // nullable regardless of children: unequal lengths / null elements → null
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val lf = isFloatArr(left)
    val rf = isFloatArr(right)
    val n = a.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xGet = if (isFloatArr(left)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val yGet = if (isFloatArr(right)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ($xGet) * ($yGet);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

object VecDot {
  /** Column wrapper: drop-in for `aggregate(zip_with(a, b, *), 0, +)`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm as a dot with itself (one expression evaluation). */
  def norm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(apply(v, v))
}
