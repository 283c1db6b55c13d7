package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Luhn mod-10 validation of a candidate card-number string — the
  * check that keeps a credit-card PII rule from redacting every
  * 16-digit identifier (order ids, tracking numbers): a digit-shaped
  * match is only PII if its checksum holds, which is true for real
  * PANs and for 1-in-10 random digit runs. Space and dash separators
  * are skipped; any other non-digit (or an all-separator/empty
  * string) is invalid. One fused loop inside whole-stage codegen —
  * the same reason the vector expressions are native: this runs on
  * every regex candidate of a 100 TB scrub scan.
  *
  * The SQL oracle reproduces it with a right-to-left
  * list_transform fold over the separator-stripped digits (t9's CTE),
  * so validity decisions are engine-identical.
  */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"luhn_valid expects a string, got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    var sum = 0; var pos = 0; var i = s.length - 1
    while (i >= 0) {
      val c = s.charAt(i)
      if (c != ' ' && c != '-') {
        if (c < '0' || c > '9') return false
        var d = c - '0'
        if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d; pos += 1
      }
      i -= 1
    }
    pos > 0 && sum % 10 == 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val sum = ctx.freshName("sum")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
        String $s = $a.toString();
        int $sum = 0; int $pos = 0; boolean $bad = false;
        for (int $i = $s.length() - 1; $i >= 0; $i--) {
          char $c = $s.charAt($i);
          if ($c == ' ' || $c == '-') continue;
          if ($c < '0' || $c > '9') { $bad = true; break; }
          int $d = $c - '0';
          if ($pos % 2 == 1) { $d *= 2; if ($d > 9) $d -= 9; }
          $sum += $d; $pos += 1;
        }
        ${ev.value} = !$bad && $pos > 0 && $sum % 10 == 0;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LuhnValid {
  /** Column-API form. */
  def luhn_valid(c: Column): Column =
    GraftBridge.column(LuhnValid(GraftBridge.expression(c)))

  /** Register `luhn_valid` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "luhn_valid", exprs => LuhnValid(exprs(0)), "built-in")
}
