package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §2.B custom-aggregate row): per-group
  * centroid of `array<float>` embeddings.
  *
  * Accumulates per-dimension sums as SCALED LONGS (×10⁶, half-up) rather than
  * doubles: integer addition is associative, so the result is bitwise
  * identical under any partitioning / merge order — on 4 test threads, 32
  * bench threads, or 1000 executors — and exactly reproducible by the DuckDB
  * oracle. The ×10⁶ grid loses < 5e-7 per element, far below the gate's 1e-4
  * output rounding.
  */
case class CentroidBuf(sums: Array[Long], count: Long)

object CentroidAgg extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
  val Scale = 1000000L

  override def zero: CentroidBuf = CentroidBuf(Array.emptyLongArray, 0L)

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    require(b.sums.isEmpty || v.length == b.sums.length,
      s"ragged input: vector dim ${v.length} != accumulator dim ${b.sums.length}")
    val sums = if (b.sums.isEmpty) new Array[Long](v.length) else b.sums
    var i = 0
    while (i < v.length) {
      // half-up floor(x + 1/2) — the r11 house quantizer (Det.quant): the
      // identical IEEE op sequence the declarative sides and the DuckDB
      // oracle now use, bit-deterministic at .5 boundaries in either sign
      sums(i) += math.floor(v(i).toDouble * Scale + 0.5).toLong
      i += 1
    }
    CentroidBuf(sums, b.count + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      require(a.sums.length == b.sums.length,
        s"ragged partials: ${a.sums.length} != ${b.sums.length}")
      val sums = a.sums.clone()
      var i = 0
      while (i < sums.length) { sums(i) += b.sums(i); i += 1 }
      CentroidBuf(sums, a.count + b.count)
    }
  }

  override def finish(r: CentroidBuf): Seq[Double] =
    r.sums.toSeq.map(s => s / Scale.toDouble / r.count)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
