package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.operators.{Text, Vectors}

/** Randomized op-sequence fuzz for the remaining increment stores — band
  * (textual near-dup, q109), gram (decontamination, q113), and cell
  * (semantic, q110). LifecycleFuzzSpec covers the index layouts and the
  * digest store; these three share the same settle/swap/append protocol but
  * each carries its own identity state (`_params` signing tag, `_centroids`
  * model dir), exactly the bookkeeping a random interleaving of appends,
  * at-least-once REPLAYS, and compactions can corrupt without any single
  * scenario test noticing. Invariant after every op: the store's DISTINCT
  * row set equals a FRESH build over a driver-side model of the accepted
  * set — replays may duplicate rows (the documented storage debt) but must
  * never change the distinct set, and a compaction must never lose rows or
  * the store's identity.
  */
class StoreFuzzSpec extends SparkSpec {

  private def docIds(pred: Column): Set[Long] =
    Tables.documents(spark, sf0001).filter(pred)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("randomized band-store sequences: distinct rows equal a fresh build") {
    val doc = Tables.documents(spark, sf0001)
    val rnd = new scala.util.Random(7341L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fuzzband").toString + "/store"
    Text.buildBandStore(spark, doc.filter(col("doc_id") % 3 === 0), dir)
    var model: Set[Long] = docIds(col("doc_id") % 3 === 0)
    var lastAppend: Option[Column] = None
    val ops = scala.collection.mutable.ArrayBuffer[String]()
    def distinctRows(d: String): Set[(Long, Int, Long)] =
      spark.read.parquet(d).select(col("sdoc_id"), col("sband"), col("sbh"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    (1 to 8).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 =>
          val m = 4 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val pred = col("doc_id") % m === r
          Text.appendToBandStore(spark, dir, doc.filter(pred))
          model ++= docIds(pred)
          lastAppend = Some(pred)
          ops += s"append($m,$r)"
        case 1 => lastAppend match {
          case Some(pred) => // at-least-once replay: rows duplicate, set unchanged
            Text.appendToBandStore(spark, dir, doc.filter(pred))
            ops += "replay"
          case None => ()
        }
        case 2 => Text.compactStore(spark, dir); ops += "compact"
      }
      val fresh = java.nio.file.Files
        .createTempDirectory("graft-fuzzbandref").toString + "/store"
      Text.buildBandStore(
        spark, doc.filter(col("doc_id").isin(model.toSeq: _*)), fresh)
      assert(distinctRows(dir) == distinctRows(fresh),
        s"band-store drift after [${ops.mkString(" -> ")}]")
    }
    // the signing tag must survive whatever compaction state the sequence
    // left: a mismatched append is still refused...
    val mismatch = intercept[IllegalArgumentException] {
      Text.appendToBandStore(spark, dir, doc.limit(1), shingleLen = 5)
    }
    assert(mismatch.getMessage.contains("signed under"))
    // ...and a matching append still lands
    Text.appendToBandStore(spark, dir, doc.filter(col("doc_id") % 3 === 1))
    assert(distinctRows(dir).map(_._1).exists(id => id % 3 == 1))
  }

  test("randomized gram-store sequences: the probe always equals the model") {
    val doc = Tables.documents(spark, sf0001)
    def gramsOf(pred: Column): Seq[(Long, Long, Long)] =
      Text.gramDigestsOf(doc.filter(pred), 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val rnd = new scala.util.Random(55117L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fuzzgram").toString + "/store"
    Text.buildGramStore(spark, doc.filter(col("doc_id") % 5 === 0), dir)
    // model: eval-doc id -> its distinct gram-digest set
    var model: Map[Long, Set[(Long, Long)]] =
      gramsOf(col("doc_id") % 5 === 0)
        .groupBy(_._1).map { case (id, gs) => id -> gs.map(g => (g._2, g._3)).toSet }
    var lastAppend: Option[Column] = None
    val ops = scala.collection.mutable.ArrayBuffer[String]()
    (1 to 8).foreach { step =>
      rnd.nextInt(3) match {
        case 0 =>
          val m = 4 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val pred = col("doc_id") % m === r
          Text.appendToGramStore(spark, dir, doc.filter(pred))
          model ++= gramsOf(pred).groupBy(_._1)
            .map { case (id, gs) => id -> gs.map(g => (g._2, g._3)).toSet }
          lastAppend = Some(pred)
          ops += s"append($m,$r)"
        case 1 => lastAppend match {
          case Some(pred) =>
            Text.appendToGramStore(spark, dir, doc.filter(pred))
            ops += "replay"
          case None => ()
        }
        case 2 => Text.compactStore(spark, dir); ops += "compact"
      }
      // probe a rolling batch: per-doc contamination counts must match the
      // driver model exactly (countDistinct semantics — replays invisible)
      val pm = 6; val pr = step % pm
      val ppred = col("doc_id") % pm === pr
      val got = Text.decontaminateBatchAgainstStore(spark, doc.filter(ppred), dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = gramsOf(ppred).groupBy(_._1).flatMap { case (id, gs) =>
        val digs = gs.map(g => (g._2, g._3)).toSet
        val shared = digs.filter(d => model.values.exists(_.contains(d)))
        val evalDocs = model.count { case (_, s) => s.exists(shared.contains) }
        if (shared.isEmpty) None
        else Some((id, shared.size.toLong, evalDocs.toLong))
      }.toSet
      assert(got == want,
        s"gram-store probe drift after [${ops.mkString(" -> ")}]: " +
          s"extra=${(got -- want).toSeq.sorted} missing=${(want -- got).toSeq.sorted}")
    }
    val mismatch = intercept[IllegalArgumentException] {
      Text.appendToGramStore(spark, dir, doc.limit(1), gram = 5)
    }
    assert(mismatch.getMessage.contains("signed under"))
  }

  test("randomized span/line-dict/novelty store sequences: distinct rows equal a fresh build") {
    // The r7 store trio shares the band store's settle/swap/append protocol
    // and (since r8) its `_params` signing tag — one generic harness fuzzes
    // all three: after every randomized append / at-least-once replay /
    // compaction, the store's DISTINCT digest-pair set must equal a fresh
    // build over the driver-side model of the accepted set, and the signing
    // tag must survive to refuse a drifted append while accepting a
    // matching one.
    val doc = Tables.documents(spark, sf0001)
    case class Family(
        name: String,
        build: (DataFrame, String) => Unit,
        append: (String, DataFrame) => Unit,
        driftAppend: String => Unit,
        cols: (String, String))
    val families = Seq(
      Family("span",
        (d, dir) => Text.buildSpanStore(spark, d, dir),
        (dir, d) => Text.appendToSpanStore(spark, dir, d),
        dir => Text.appendToSpanStore(spark, dir, doc.limit(1), spanLen = 41),
        ("sh1", "sh2")),
      Family("linedict",
        (d, dir) => Text.buildLineDictStore(spark, d, dir),
        (dir, d) => Text.appendToLineDictStore(spark, dir, d),
        dir => Text.appendToLineDictStore(spark, dir, doc.limit(1), lineWidth = 3),
        ("sl1", "sl2")),
      Family("novelty",
        (d, dir) => Text.buildNoveltyGramStore(spark, d, dir),
        (dir, d) => Text.appendToNoveltyGramStore(spark, dir, d),
        dir => Text.appendToNoveltyGramStore(spark, dir, doc.limit(1), gram = 4),
        ("sg64", "sg64b")))
    families.foreach { f =>
      val rnd = new scala.util.Random(9177L + f.name.##)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz${f.name}").toString + "/store"
      f.build(doc.filter(col("doc_id") % 3 === 0), dir)
      var model: Set[Long] = docIds(col("doc_id") % 3 === 0)
      var lastAppend: Option[Column] = None
      val ops = scala.collection.mutable.ArrayBuffer[String]()
      def distinctRows(d: String): Set[(Long, Long)] =
        spark.read.parquet(d).select(col(f.cols._1), col(f.cols._2))
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (1 to 6).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val m = 4 + rnd.nextInt(4); val r = rnd.nextInt(m)
            val pred = col("doc_id") % m === r
            f.append(dir, doc.filter(pred))
            model ++= docIds(pred)
            lastAppend = Some(pred)
            ops += s"append($m,$r)"
          case 1 => lastAppend match {
            case Some(pred) => // replay: rows may duplicate, set unchanged
              f.append(dir, doc.filter(pred))
              ops += "replay"
            case None => ()
          }
          case 2 => Text.compactStore(spark, dir); ops += "compact"
        }
        val fresh = java.nio.file.Files
          .createTempDirectory(s"graft-fuzz${f.name}ref").toString + "/store"
        f.build(doc.filter(col("doc_id").isin(model.toSeq: _*)), fresh)
        assert(distinctRows(dir) == distinctRows(fresh),
          s"${f.name}-store drift after [${ops.mkString(" -> ")}]")
      }
      // identity survives the sequence: drifted appends refused by name...
      val mismatch = intercept[IllegalArgumentException](f.driftAppend(dir))
      assert(mismatch.getMessage.contains("signed under"),
        s"${f.name}: ${mismatch.getMessage}")
      // ...and a matching append still lands
      val before = distinctRows(dir)
      f.append(dir, doc.filter(col("doc_id") % 3 === 1))
      val fresh = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz${f.name}fin").toString + "/store"
      f.build(doc.filter(
        col("doc_id").isin((model ++ docIds(col("doc_id") % 3 === 1)).toSeq: _*)), fresh)
      assert(distinctRows(dir) == distinctRows(fresh),
        s"${f.name}: post-drift matching append drifted")
      assert(distinctRows(dir).size >= before.size, s"${f.name}: append lost rows")
    }
  }

  test("randomized cell-store sequences: end state equals a fresh assignment") {
    val emb = Tables.embeddings(spark, sf0001)
    def embOf(pred: Column): DataFrame = emb.filter(pred)
    def idsOf(pred: Column): Set[Long] =
      emb.filter(pred).select(col("vec_id")).collect().map(_.getLong(0)).toSet

    val rnd = new scala.util.Random(90210L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fuzzcell").toString + "/store"
    Vectors.buildCellStore(spark, embOf(col("vec_id") % 3 === 0), dir, k = 4)
    var model: Set[Long] = idsOf(col("vec_id") % 3 === 0)
    var lastAppend: Option[Column] = None
    val ops = scala.collection.mutable.ArrayBuffer[String]()
    (1 to 6).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 =>
          val m = 4 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val pred = col("vec_id") % m === r
          Vectors.appendToCellStore(spark, dir, embOf(pred))
          model ++= idsOf(pred)
          lastAppend = Some(pred)
          ops += s"append($m,$r)"
        case 1 => lastAppend match {
          case Some(pred) =>
            Vectors.appendToCellStore(spark, dir, embOf(pred))
            ops += "replay"
          case None => ()
        }
        case 2 => Vectors.compactCellStore(spark, dir); ops += "compact"
      }
      // distinct (vec_id, cell) must equal a fresh assignment of the model
      // set under the store's OWN persisted centroids — appends must never
      // re-fit, and a compaction must keep `_centroids` with the data
      val cents = Vectors.loadCentroids(spark, s"$dir/_centroids")
      // cast the partition column: parquet partition-value inference may
      // type small cell ids as Integer where the writer had Long
      val got = spark.read.parquet(dir)
        .select(col("svec_id").cast("long"), col("scell").cast("long")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Vectors.assignCellsWith(embOf(col("vec_id").isin(model.toSeq: _*)), cents)
        .select(col("vec_id").cast("long"), col("cell").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"cell-store drift after [${ops.mkString(" -> ")}]: " +
          s"extra=${(got -- want).toSeq.sorted} missing=${(want -- got).toSeq.sorted}")
    }
  }
}
