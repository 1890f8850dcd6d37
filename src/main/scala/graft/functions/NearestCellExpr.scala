package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}
import org.apache.spark.sql.GraftBridge

/** Native nearest-centroid assignment: argmax over `cents` of
  * dot(v, w_i) − ‖w_i‖²/2 (≡ argmin L2), ties to the LOWEST cell index —
  * the kernel of Similarity's cellOf.
  *
  * The composed form (an `array` of nlist VecDot-minus-literal scores fed
  * to array_max + array_position) is fine at the pinned nlist=16, but the
  * corpus-sized path grows nlist as √n (`ivfParamsFor`), and a
  * 142-element expression array at sf1 already drops the projection out
  * of whole-stage codegen — the round-11 scale measurement booked
  * q_sim_ivf_auto at 8× on 10× data from exactly that cliff, with the
  * same interpreted-evaluation failure waiting at any real corpus. This
  * node is one JIT loop over the row's primitive storage and a
  * plan-constant centroid matrix (a broadcast-sized reference object, not
  * nlist expression nodes), so cost per row is nlist×dim flops at
  * compiled speed regardless of nlist.
  *
  * Exactly replicates the composed tree's semantics so substitution is
  * invisible to the centroid-literal oracles: scores accumulate
  * sequentially in index order (the VecDot discipline — bit-identical
  * doubles), ties keep the first maximum (array_position finds the first
  * equal element), and a null element or a length≠dim row yields NULL
  * (zip_with null-padding poisons every score, so array_max is null).
  * `cents` is a Seq-of-Seq so the case-class equality Catalyst uses for
  * plan matching stays structural. */
case class NearestCell(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  // same driver-side arithmetic as the composed form's lit(w.map(x*x).sum/2)
  @transient private lazy val halves: Array[Double] =
    matrix.map(w => w.map(x => x * x).sum / 2)

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if cents.nonEmpty &&
        cents.forall(_.length == cents.head.length) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a non-empty rectangular centroid matrix")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float|double> input, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else NearestCell.compute(v.asInstanceOf[ArrayData], isFloatArr, matrix, halves)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("cellMatrix", matrix, "double[][]")
    val h = ctx.addReferenceObj("cellHalves", halves, "double[]")
    val cls = NearestCell.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("cell")
    val resultCode =
      code"""
         |boolean ${ev.isNull} = true;
         |int ${ev.value} = -1;
         |if (!${childGen.isNull}) {
         |  java.lang.Integer $boxed =
         |    $cls.compute(${childGen.value}, $isFloatArr, $m, $h);
         |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.intValue(); }
         |}
       """.stripMargin
    ev.copy(code = childGen.code + resultCode)
  }
}

object NearestCell {
  /** Null (boxed) when the row cannot score — null element or length≠dim —
    * matching the composed tree; otherwise the first-maximum cell index. */
  def compute(a: ArrayData, isFloat: Boolean, m: Array[Array[Double]],
      h: Array[Double]): java.lang.Integer = {
    val dim = m(0).length
    val n = a.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val x = new Array[Double](n)
    i = 0
    while (i < n) {
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    // Double.compare, not `>`: Spark's array_max/array_position use the
    // SQL total order where NaN is greatest and equals itself, so a row
    // with a NaN element (every score NaN) books cell 0 in the composed
    // form — plain `>` would never accept NaN and return an invalid -1
    var best = 0
    var bestScore = Double.NaN
    var c = 0
    while (c < m.length) {
      val w = m(c)
      var s = 0.0d
      var j = 0
      while (j < n) { s += x(j) * w(j); j += 1 }
      s -= h(c)
      if (s == 0.0d) s = 0.0d // fold -0.0: SQL comparisons equate the zeros
      if (c == 0 || java.lang.Double.compare(s, bestScore) > 0) {
        bestScore = s; best = c
      }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }

  /** Column wrapper: drop-in for the composed score-array argmax. */
  def apply(vec: Column, cents: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCell(GraftBridge.expression(vec),
      cents.map(_.toSeq).toSeq))
}
