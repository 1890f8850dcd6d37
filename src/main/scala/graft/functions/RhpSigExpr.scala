package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.GraftBridge

/** Native random-hyperplane LSH signature: `planes` sign bits packed into
  * one long (the kernel of Similarity.rhpSignature — see its scaladoc for
  * the quantization/mixer design and why it is integer-exact and
  * DuckDB-replayable).
  *
  * The composed HOF form (transform over planes, each an aggregate over a
  * zip_with carrying a 12-op mixer per element) is interpreted lambda
  * dispatch with boxed longs — measured as the dominant cost of the LSH
  * dedup/ANN queries once VecDot took the scoring side. This node runs
  * the planes×dims loop as one JIT-compiled method over the array's
  * primitive storage (same discipline as [[VecDot]]), called once per row
  * from generated code under WholeStageCodegen.
  *
  * Exactly replicates the HOF tree's null semantics so substitution is
  * invisible to every caller and oracle: a NULL array or any NULL element
  * yields signature 0L (in the HOF tree the null poisons every plane's
  * projection and `when(proj >= 0, 1).otherwise(0)` books each bit as 0),
  * as does an empty (zero-length, non-null) array (zip_with null-pads it
  * against the index sequence, so every projection is again NULL), so the
  * output is non-nullable. Weights depend only on (plane, dim) and
  * cost ~12 JIT'd long ops each — cheaper inline than any materialized
  * matrix once out of the interpreter. */
case class RhpSig(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "rhp_sig"

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if planes >= 1 && planes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects planes in [1, 64], got $planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float|double> input, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSig =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else RhpSig.compute(v.asInstanceOf[ArrayData], isFloatArr, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = RhpSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val resultCode =
      code"""
         |final long ${ev.value} = ${childGen.isNull} ? 0L :
         |  $cls.compute(${childGen.value}, $isFloatArr, $planes);
       """.stripMargin
    ev.copy(code = childGen.code + resultCode, isNull = FalseLiteral)
  }
}

object RhpSig {
  /** One signature: quantize (floor(x·2^20), exact for float-to-double),
    * project each plane with the 3-round-LCG/xor-shift mixed weights, pack
    * sign bits. All intermediates positive and < 2^61 — `%` here IS the
    * pmod of the Column form and of the DuckDB oracle's BIGINT replica. */
  def compute(a: ArrayData, isFloat: Boolean, planes: Int): Long = {
    val n = a.numElements()
    // HOF parity: for an empty array zip_with null-pads q=[] against the
    // non-empty sequence(0, -1) index array, so every plane's projection is
    // NULL and books bit 0 — NOT the all-ones that proj=0 >= 0 would give.
    if (n == 0) return 0L
    var i = 0
    while (i < n) { // HOF parity: one null element zeroes every plane
      if (a.isNullAt(i)) return 0L
      i += 1
    }
    val q = new Array[Long](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      q(i) = math.floor(x * 1048576.0d).toLong
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0L
      var j = 0
      while (j < n) {
        val s1 = p.toLong * 1000003L + j
        val h1 = (s1 * 1103515245L + 12345L) % 2147483648L
        val h2 = ((h1 ^ (h1 >> 16)) * 747796405L + 2891336453L) % 2147483648L
        val h3 = ((h2 ^ (h2 >> 16)) * 277803737L + 12345L) % 2147483648L
        proj += q(j) * ((h3 >> 11) - 524288L)
        j += 1
      }
      if (proj >= 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Column wrapper: drop-in for the HOF signature tree. */
  def apply(vec: Column, planes: Int): Column =
    GraftBridge.column(RhpSig(GraftBridge.expression(vec), planes))
}
