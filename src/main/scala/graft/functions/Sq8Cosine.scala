package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Fused cosine over SQ8 scalar-quantized vectors — the scoring
  * kernel of the s17 path: codes are one signed byte per dimension
  * (offset-128, so q ∈ [0,255] stores as q−128 ∈ [−128,127] — 4×
  * smaller than the float corpus), dequantized ON THE FLY inside one
  * codegen loop as `dq_i = mn_i + (code_i + 128)·s_i` against the
  * broadcast per-dimension affine constants (`mn` = per-dim min,
  * `s` = (max−min)/255 — both constant-folded literals in the plan,
  * zero per-row payload).
  *
  * Result is `dot/(sqrt(na)·sqrt(nb))` over the dequantized values
  * with each accumulator folding sequentially left-to-right — the
  * exact fold order of the SQL oracles' `list_sum(list_transform(...))`
  * chains, so the two engines' doubles are bit-identical.
  *
  * NULL semantics match [[CosineSimilarityNullable]]: NULL on any
  * NULL input, any length mismatch among the four arrays, or a NULL
  * element — a malformed code vector can never score as a perfect
  * prefix match.
  */
case class Sq8Cosine(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  private def isArr(e: Expression, t: DataType) = e.dataType match {
    case ArrayType(`t`, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isArr(first, ByteType) && isArr(second, ByteType) &&
        isArr(third, DoubleType) && isArr(fourth, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sq8_cosine expects (array<tinyint> qa, array<tinyint> qb, " +
        "array<double> mn, array<double> s), got (" +
        Seq(first, second, third, fourth).map(_.dataType.simpleString)
          .mkString(", ") + ")")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, mnA: Any, sA: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val mn = mnA.asInstanceOf[ArrayData]
    val s = sA.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n || mn.numElements() != n ||
      s.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i) || mn.isNullAt(i) || s.isNullAt(i))
        return null
      i += 1
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val dqa = mn.getDouble(i) + (x.getByte(i) + 128).toDouble * s.getDouble(i)
      val dqb = mn.getDouble(i) + (y.getByte(i) + 128).toDouble * s.getDouble(i)
      dot += dqa * dqb; na += dqa * dqa; nb += dqb * dqb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, mn, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val dqa = ctx.freshName("dqa")
      val dqb = ctx.freshName("dqb")
      s"""
        int $n = $a.numElements();
        boolean $bad = $b.numElements() != $n ||
          $mn.numElements() != $n || $s.numElements() != $n;
        for (int $i = 0; !$bad && $i < $n; $i++) {
          $bad = $a.isNullAt($i) || $b.isNullAt($i) ||
            $mn.isNullAt($i) || $s.isNullAt($i);
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $dqa = $mn.getDouble($i)
              + (double) ($a.getByte($i) + 128) * $s.getDouble($i);
            double $dqb = $mn.getDouble($i)
              + (double) ($b.getByte($i) + 128) * $s.getDouble($i);
            $dot += $dqa * $dqb; $na += $dqa * $dqa; $nb += $dqb * $dqb;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(f: Expression,
      sec: Expression, t: Expression, fo: Expression): Expression =
    copy(first = f, second = sec, third = t, fourth = fo)
}

object Sq8Cosine {
  def sq8_cosine(qa: Column, qb: Column, mn: Column, s: Column): Column =
    GraftBridge.column(Sq8Cosine(GraftBridge.expression(qa),
      GraftBridge.expression(qb), GraftBridge.expression(mn),
      GraftBridge.expression(s)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq8_cosine",
      exprs => Sq8Cosine(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
}
