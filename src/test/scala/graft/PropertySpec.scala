package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CentroidSet, Text}
import graft.operators.Lsh.LshModel

/** ScalaCheck properties for the pure kernels (SURVEY.md §5.2): these run on
  * arbitrary generated inputs, not just the fixtures, pinning the invariants
  * the distributed operators rely on. (The scalatest-plus bridge isn't in the
  * offline dependency set, so a seeded sampler drives the generators.)
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val dim = 8
  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-10f, 10f))

  private def mkModel(tables: Int, bits: Int): LshModel = {
    // Deterministic pseudo-random planes — the property targets hashing, not fit.
    val rng = new scala.util.Random(42)
    val planes = tables * bits
    LshModel(tables, bits, dim,
      Array.fill(planes)(Array.fill(dim)(rng.nextFloat() - 0.5f)),
      Array.fill(planes)(Array.fill(dim)(rng.nextFloat() - 0.5f)))
  }

  test("property: lsh hashes are deterministic and within [0, 2^bits)") {
    val m = mkModel(tables = 4, bits = 5)
    forAll(vecGen) { v =>
      val h1 = m.hashVector(v)
      assert(h1.toSeq == m.hashVector(v).toSeq)
      assert(h1.length == 4)
      assert(h1.forall(h => h >= 0 && h < (1L << 5)))
    }
  }

  test("property: hashVector and hashArrayData agree (codegen-path parity)") {
    val m = mkModel(tables = 3, bits = 4)
    forAll(vecGen) { v =>
      val viaArrayData =
        m.hashArrayData(new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
      assert(viaArrayData.toSeq == m.hashVector(v).toSeq)
    }
  }

  test("property: nearest cells are ranked by true distance, no dup, no miss") {
    val rng = new scala.util.Random(7)
    val cents = CentroidSet(
      Array.tabulate(16)(_.toLong),
      Array.fill(16)(Array.fill(dim)(rng.nextFloat())))
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i).toDouble - b(i)) * (a(i).toDouble - b(i))).sum
    forAll(vecGen) { v =>
      val got = cents.nearestArray(v, 5)
      assert(got.length == 5 && got.distinct.length == 5)
      // matches a naive sort by (distance, id)
      val naive = cents.ids.zip(cents.vecs)
        .sortBy { case (id, cv) => (d2(v, cv), id) }.map(_._1).take(5)
      assert(got.toSeq == naive.toSeq)
      // full probe returns every cell exactly once
      assert(cents.nearestArray(v, 16).sorted.toSeq == (0L until 16L))
    }
  }

  test("property: simhash of a permuted token multiset is identical") {
    val toks = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    forAll(toks) { ts =>
      val shuffled = scala.util.Random.shuffle(ts)
      assert(Text.simhash64(ts) == Text.simhash64(shuffled))
    }
  }

  test("property: fingerprint is invariant to text outside the minimal gram") {
    // appending text can only lower or keep the min-hash, never invalidate
    // determinism; and equal texts always agree
    forAll(Gen.alphaNumStr.suchThat(_.length >= 8)) { t =>
      assert(Text.fingerprint(t) == Text.fingerprint(t))
      assert(Text.fingerprint(t + t) <= Text.fingerprint(t))
    }
  }

  test("property: bq encodeSeq and encodeArrayData agree (codegen-path parity)") {
    val rng = new scala.util.Random(11)
    val model = graft.operators.Pq.BqModel(dim,
      Array.fill(dim)((rng.nextGaussian() * 1e5).toLong))
    forAll(vecGen) { v =>
      val viaArrayData = model.encodeArrayData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
      assert(viaArrayData == model.encodeSeq(v.toSeq))
      // only the low `dim` bits can ever be set
      assert((viaArrayData >>> dim) == 0L || dim == 64)
    }
  }

  test("property: dHash sampling wraps — short payloads equal their 64-byte tiling") {
    val bytesGen = Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray).suchThat(b => b.length <= 64)
    forAll(bytesGen) { p =>
      val tiled = Array.tabulate(64)(i => p(i % p.length))
      assert(graft.operators.Media.dHash(p) == graft.operators.Media.dHash(tiled),
        "wraparound sampling must equal the explicit cyclic extension")
      // strict > between cyclic neighbors: a constant payload sets no bits
      val const = Array.fill(17)(p(0))
      assert(graft.operators.Media.dHash(const) == 0L)
      // a cyclic chain of strict > is impossible, so never all-ones
      assert(java.lang.Long.bitCount(graft.operators.Media.dHash(p)) < 64)
    }
  }
}
