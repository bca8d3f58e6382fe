package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Text

/** Native Catalyst expressions for the text-fingerprinting hot paths — the
  * same codegen discipline as [[VectorExpressions]] (no per-row Seq decode /
  * boxing; the loop body is a shared JVM method so interpreted eval and
  * generated code cannot drift). These replace Scala UDFs on full-corpus
  * narrow maps: at fixture scale the UDFs were not the bottleneck, at real
  * corpus scale the per-row ScalaUDF encoder round-trip is pure overhead on
  * every document.
  *
  * Bit-compatibility contract: each expression produces exactly the bytes of
  * the UDF it replaces (asserted by the goldens and the brute-force banding
  * specs), so swapping them cannot perturb gated output.
  */
object TextExpressions {

  /** 64-bit SimHash over a token array (q35/q38 signature step). */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(toks: Any): Any =
      Text.simhashArrayData(toks.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.simhashArrayData($t);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Rolling-hash min-gram document fingerprint (q37). */
  case class Fingerprint64(child: Expression, gram: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "fingerprint64"

    override def nullSafeEval(text: Any): Any =
      Text.fingerprint(text.asInstanceOf[UTF8String].toString, gram)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.fingerprint($t.toString(), $gram);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass repetition/quality counters per document (q79/q83 hot path):
    * struct(n_tokens, n_distinct_bigrams, top_tok, n_stop) from a token
    * array. Replaces a stack of CodegenFallback higher-order functions
    * (transform/filter/array_distinct — O(distinct·n) interpreted closure
    * dispatch per row) with one compiled hashing pass. The stopword set
    * rides the plan as a reference object.
    */
  case class RepStats(child: Expression, stop: java.util.HashSet[UTF8String])
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_distinct_bigrams", LongType, nullable = false),
      StructField("top_tok", LongType, nullable = false),
      StructField("n_stop", LongType, nullable = false)))
    override def prettyName: String = "rep_stats"

    override def nullSafeEval(toks: Any): Any =
      Text.repStatsArrayData(toks.asInstanceOf[ArrayData], stop)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("stopSet", stop, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.repStatsArrayData($t, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All length-`spanLen` window digests of a document in one rolling pass
    * (q114 hot path): array of (pos, h1, h2). See
    * [[graft.operators.Text.spanDigestArrayData]] for the hash contract.
    */
  case class SpanDigests(child: Expression, spanLen: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "span_digests"

    override def nullSafeEval(text: Any): Any =
      Text.spanDigestArrayData(text.asInstanceOf[UTF8String], spanLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.spanDigestArrayData($t, $spanLen);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def spanDigests(text: Column, spanLen: Int): Column =
    ExpressionUtils.column(SpanDigests(ExpressionUtils.expression(text), spanLen))

  def simhash(toks: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(toks)))
  def fingerprint(text: Column, gram: Int = 8): Column =
    ExpressionUtils.column(Fingerprint64(ExpressionUtils.expression(text), gram))

  def repStats(toks: Column, stopwords: Seq[String]): Column = {
    val set = new java.util.HashSet[UTF8String]()
    stopwords.foreach(s => set.add(UTF8String.fromString(s)))
    ExpressionUtils.column(RepStats(ExpressionUtils.expression(toks), set))
  }
}
