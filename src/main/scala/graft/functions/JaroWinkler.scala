package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Winkler 1990), the string-agreement signal
  * the north rule requires for pairwise scoring. Spark has no built-in
  * (only `levenshtein`), so this is a custom Catalyst expression with
  * whole-stage codegen via a static Java-callable kernel — it stays
  * inside the generated loop, unlike a Scala UDF.
  *
  * Semantics take the role of the reference's per-signal similarity in
  * its multi-signal link probability
  * (reference: src/core/cross_device_linker.py:143-216).
  */
object JW {
  /** Standard parameters: prefix scale 0.1, max common prefix 4,
    * Winkler boost only when jaro > 0.7. */
  def jw(l: UTF8String, r: UTF8String): Double = jaroWinkler(l.toString, r.toString)

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) j
    else {
      var l = 0
      val maxP = math.min(4, math.min(a.length, b.length))
      while (l < maxP && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!bMatch(k) && a.charAt(i) == b.charAt(k)) {
          aMatch(i) = true; bMatch(k) = true; matches += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: compare matched chars in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / la + m / lb + (m - t / 2.0) / m) / 3.0
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JW.jw(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.JW.jw($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftShim.column(JaroWinklerExpr(GraftShim.expression(a), GraftShim.expression(b)))

  /** Register `jaro_winkler` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinklerExpr(exprs.head, exprs(1)),
      "scala_udf"
    )
}
