package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst cosine similarity over two `array<float>` columns.
  *
  * The composable form (`aggregate(zip_with(...))`, see
  * [[graft.operators.Similarity.dot]]) materialises an intermediate
  * array per row pair; this expression runs one fused loop inside
  * whole-stage codegen with zero allocation — the hot path for
  * ANN/near-dup over 100 TB of embeddings.
  *
  * Accumulation is sequential left-to-right in double precision and
  * the result is `dot / (sqrt(na) * sqrt(nb))` — bit-identical to the
  * composable form, so either can serve the same oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.getFloat($i);
          double $yv = (double) $b.getFloat($i);
          $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine over float OR double arrays with the EXACT degenerate
  * semantics of the composable chain
  * `try_divide(aggregate(zip_with(a,b,*)), norm(a)*norm(b))`:
  * NULL when lengths differ (zip_with pads the shorter side with
  * nulls, poisoning the fold), NULL when either array holds a null
  * element, NULL when either norm is zero (try_divide). For
  * well-formed vectors the value is bit-identical to
  * [[CosineSimilarity]] and to the SQL oracles' list_transform fold.
  *
  * Exists because the k-means round-2 path scores float vectors
  * against DOUBLE centroid means: the composable HOF chain there runs
  * as an interpreted expression tree, and at the 10× scale-up corpus
  * it was 55 of semDedup's 62 wall-clock seconds. One fused codegen
  * loop removes that entirely. */
case class CosineSimilarityNullable(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim_nullable expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (isFloat(left)) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (isFloat(right)) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val bad = ctx.freshName("bad")
      def get(arr: String, e: Expression) =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
        int $n = $a.numElements();
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        boolean $bad = ($n != $b.numElements());
        if (!$bad) {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            double xv = ${get(a, left)};
            double yv = ${get(b, right)};
            $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
          }
        }
        if ($bad || $na == 0.0 || $nb == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product over `array<float|double>` columns — the
  * PQ/MIPS primitive (subspace scoring and ADC lookup tables are raw
  * dots, no norms). Same left-to-right double accumulation as
  * [[CosineSimilarity]]'s numerator, so a SQL
  * `list_sum(list_transform(range(...), i -> a[i]*b[i]))` fold
  * reproduces it bit-for-bit. Native for the same reason as the
  * cosine: an `aggregate(zip_with(...))` HOF runs interpreted.
  *
  * Degenerate semantics match [[CosineSimilarityNullable]], NOT a
  * silent prefix dot: NULL on length mismatch or any null element.
  * The function is SQL-registered session-wide, and a partial dot
  * over a malformed vector is exactly the "prefix scored as a real
  * score" hazard the nullable cosine exists to prevent. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (isFloat(left)) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (isFloat(right)) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      def get(arr: String, e: Expression) =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
        int $n = $a.numElements();
        double $dot = 0.0;
        boolean $bad = ($n != $b.numElements());
        if (!$bad) {
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $dot += ${get(a, left)} * ${get(b, right)};
          }
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API form. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-API fused dot product. */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-API form of the null-propagating float/double variant. */
  def cosine_sim_nullable(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarityNullable(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Register the native vector functions for SQL use on a session
    * (`cosine_sim`, `cosine_sim_nullable`, `dot_product`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_sim_nullable",
      exprs => CosineSimilarityNullable(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
