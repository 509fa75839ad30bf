package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused 64-bit SimHash (Charikar 2002): normalized text → sketch in
  * ONE compiled pass, bit-identical to the declarative chain
  * `explode(split(text,' ')) → xxhash64(word) → 64 ±1-vote sum
  * aggregates → sign word` (ops/Dedup.simhash) — integer votes are
  * order-independent, so fusing cannot change a single bit.
  *
  * Why: the exploded formulation evaluates 64 aggregate expressions
  * per token row (each a shiftright+mask+case) through a per-doc
  * hash aggregate; here the space-delimited token scan, the word
  * hashes (XXH64 over the token's UTF-8 bytes, seed 42 — exactly
  * Spark's `xxhash64`) and the 64 vote counters stay in registers.
  * Same fusion pattern as [[MinHashKernel]] / [[FusedSpanKernel]].
  *
  * Returns null when the text has no tokens — the exploded chain
  * emits no row for such docs, and callers filter nulls to match.
  *
  * Reference semantics: near-duplicate detection sketches over
  * normalized text (cross_device_linker.py:385-412 candidate pruning
  * family); the md5 cross-engine twin stays declarative (q28).
  */
object SimHashKernel {

  /** Space bytes never occur inside multi-byte UTF-8 sequences, so the
    * byte-level token scan is correct for any input (normText output
    * is ASCII anyway). */
  def simhash64(t: UTF8String): Any = {
    val nb = t.numBytes
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val votes = new Array[Int](64)
    var tokens = 0
    var start = 0
    var i = 0
    while (i <= nb) {
      val atEnd = i == nb
      if (atEnd || t.getByte(i) == ' '.toByte) {
        if (i > start) {
          tokens += 1
          val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (tokens == 0) null
    else {
      var sh = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sh |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(sh)
    }
  }
}

case class SimHashSigExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: a fixed local would collide (janino duplicate-variable
      // error → silent interpreted fallback) if the expression appears
      // twice in one generated method with a non-nullable child
      val r = ctx.freshName("simhashRes")
      s"""Object $r = graft.functions.SimHashKernel.simhash64($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  /** Column API: 64-bit SimHash of space-tokenized `text`; null when
    * the text has no tokens. */
  def simhash64(text: Column): Column =
    GraftShim.column(SimHashSigExpr(GraftShim.expression(text)))
}
