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

  /** Unicode NFC canonical normalization (q180's dedup-key step). Spark has
    * no built-in normalizer; a Scala UDF would pay the encoder round-trip on
    * every document of a full-corpus narrow map, so this wraps
    * `java.text.Normalizer` (the JDK's ICU-derived implementation of
    * UAX #15 — the same published algorithm DuckDB's `nfc_normalize`
    * implements, which is what makes the q180 oracle engine-exact) as a
    * codegen'd expression. The helper short-circuits the common case:
    * `Normalizer.isNormalized` is a cheap scan (true for all-ASCII, the
    * overwhelming share of web text), so already-NFC documents skip the
    * allocation entirely.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(text: Any): Any =
      Text.nfcUtf8(text.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.nfcUtf8($t);")

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

  /** One-pass intra-document line-dedup counters (q178 hot path):
    * struct(n_lines, n_dup_lines, n_tokens_removed) from a token array,
    * lines being consecutive `width`-token groups. Replaces the
    * transform/slice/array_distinct/aggregate higher-order stack (all
    * CodegenFallback, plus a per-line re-split to count kept tokens) with
    * one compiled hashing pass. Contract:
    * [[graft.operators.Text.lineDedupStatsArrayData]].
    */
  case class LineDedupStats(child: Expression, width: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = StructType(Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("n_dup_lines", LongType, nullable = false),
      StructField("n_tokens_removed", LongType, nullable = false)))
    override def prettyName: String = "line_dedup_stats"

    override def nullSafeEval(toks: Any): Any =
      Text.lineDedupStatsArrayData(toks.asInstanceOf[ArrayData], width)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.lineDedupStatsArrayData($t, $width);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-line digest rows for cross-document line dedup (q192/q193 hot
    * path): array of (idx, ntoks, h1, h2) over consecutive `width`-token
    * groups — the scan-side half of the "lines travel as 16-byte digests,
    * text never shuffles" contract. Hash contract:
    * [[graft.operators.Text.lineDigestsArrayData]].
    */
  case class LineDigests(child: Expression, width: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("ntoks", IntegerType, nullable = false),
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "line_digests"

    override def nullSafeEval(toks: Any): Any =
      Text.lineDigestsArrayData(toks.asInstanceOf[ArrayData], width)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t =>
        s"${ev.value} = graft.operators.Text.lineDigestsArrayData($t, $width);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Drop the given line indices from a token array and re-join (q193's
    * rewrite step) — one compiled pointer walk per document instead of a
    * CodegenFallback transform/filter/flatten stack. Contract:
    * [[graft.operators.Text.lineDedupRewriteArrayData]].
    */
  case class LineDedupRewrite(left: Expression, right: Expression, width: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType), ArrayType(IntegerType))
    override def dataType: DataType = StringType
    override def prettyName: String = "line_dedup_rewrite"

    override def nullSafeEval(toks: Any, removed: Any): Any =
      Text.lineDedupRewriteArrayData(
        toks.asInstanceOf[ArrayData], width, removed.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, r) =>
        s"${ev.value} = graft.operators.Text.lineDedupRewriteArrayData($t, $width, $r);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
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

  /** The k per-seed MinHash minima of a unit array in ONE compiled pass
    * (q34/q77/band-store signature step) — replaces the k-column explode +
    * `groupBy(min…)` aggregate: the whole signature stage becomes a narrow
    * scan, no unit-table shuffle, no corpus-sized pin. Accepts both unit
    * encodings used by the banding family: `array<long>` (shingle digests)
    * and `array<string>` (word tokens). Null (and therefore a dropped doc,
    * matching the aggregate's no-rows semantics) on an empty array. Hash
    * contract: [[graft.operators.Text.minhashMinimaArrayData]].
    */
  case class MinHashMinima(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {

    private def stringUnits: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == StringType

    override def inputTypes: Seq[AbstractDataType] = Seq(
      TypeCollection(ArrayType(LongType), ArrayType(StringType)))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true // empty unit set → null
    override def prettyName: String = "minhash_minima"

    override def nullSafeEval(units: Any): Any =
      Text.minhashMinimaArrayData(
        units.asInstanceOf[ArrayData], k, stringUnits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u => {
        s"""
           |${ev.value} = graft.operators.Text.minhashMinimaArrayData($u, $k, $stringUnits);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def minhashMinima(units: Column, k: Int): Column =
    ExpressionUtils.column(MinHashMinima(ExpressionUtils.expression(units), k))

  /** Fused shingle-MinHash signature of a document text — struct(mh, sz) in
    * one compiled pass; exact-parity contract and why-fused rationale:
    * [[graft.operators.Text.minhashSigOfText]].
    */
  case class MinHashSig(child: Expression, shingleLen: Int, sampleMod: Int, k: Int)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("mh", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("sz", LongType, nullable = false)))
    override def nullable: Boolean = true // empty sampled shingle set → null
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(text: Any): Any =
      Text.minhashSigOfText(
        text.asInstanceOf[UTF8String], shingleLen, sampleMod, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, t => {
        s"""
           |${ev.value} = graft.operators.Text.minhashSigOfText($t, $shingleLen, $sampleMod, $k);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def minhashSig(text: Column, shingleLen: Int, sampleMod: Int, k: Int): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(text), shingleLen, sampleMod, k))

  def spanDigests(text: Column, spanLen: Int): Column =
    ExpressionUtils.column(SpanDigests(ExpressionUtils.expression(text), spanLen))

  def lineDedupStats(toks: Column, width: Int): Column =
    ExpressionUtils.column(LineDedupStats(ExpressionUtils.expression(toks), width))

  def lineDigests(toks: Column, width: Int): Column =
    ExpressionUtils.column(LineDigests(ExpressionUtils.expression(toks), width))

  def lineDedupRewrite(toks: Column, removed: Column, width: Int): Column =
    ExpressionUtils.column(LineDedupRewrite(
      ExpressionUtils.expression(toks), ExpressionUtils.expression(removed), width))

  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))

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
