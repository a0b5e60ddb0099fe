package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingle hasher (SURVEY.md §2B X26 hot path).
  *
  * Semantics are exactly the composed pipeline
  * `array_distinct(transform(...array_join(slice(filter(split(lower(text)," "),...)...)))`
  * followed by `xxhash64(shingle)` — lowercase via UTF8String (same
  * collation-free lowering as the `lower` function), tokens split on a
  * single space with empties dropped, `n`-token shingles joined by one
  * space, hashed with Spark's XXH64 at the default seed 42, distinct.
  * One pass, no intermediate arrays or interpreted lambdas — the composed
  * form evaluated 7 higher-order functions per row and dominated the
  * dedup benchmarks.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects a string column, got $other")
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  // public and monomorphic so the generated code calls it directly on the
  // child's UTF8String — no CodegenFallback (which re-evaluates through
  // the interpreted expression tree and forces input-row materialization
  // inside an otherwise fully-codegen'd stage)
  def compute(v: UTF8String): GenericArrayData = {
    val lowered = v.toLowerCase.toString
    val parts = lowered.split(' ')
    val toks = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) toks.add(parts(i))
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](m)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native adjacent-token bigram extractor (X28 n-gram-count hot path).
  *
  * Semantics are exactly the composed pipeline over
  * `filter(split(lower(text), " "), _ != "")`: each adjacent token pair
  * joined by one space, WITH multiplicity (counts need duplicates, unlike
  * [[ShingleHashes]]'s distinct set). One pass, no interpreted
  * zip_with/filter/transform lambdas — bit-equality with the composed
  * form is asserted in TextExprSpec. */
case class TokenBigrams(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_bigrams expects a string column, got $other")
    }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  // see ShingleHashes.compute — the direct codegen call target
  def compute(v: UTF8String): GenericArrayData = {
    val lowered = v.toLowerCase.toString
    val parts = lowered.split(' ')
    val toks = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) toks.add(parts(i))
      i += 1
    }
    val m = toks.size - 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = UTF8String.fromString(toks.get(i) + " " + toks.get(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenBigrams", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Distinct xxhash64 values of the `n`-token shingles of `text`. */
  def shingle_hashes(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n))

  /** Adjacent-token bigrams of `text`, with multiplicity. */
  def token_bigrams(text: Column): Column =
    GraftBridge.column(TokenBigrams(GraftBridge.expression(text)))
}
