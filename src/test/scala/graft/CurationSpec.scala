package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("filter funnel: stages partition the corpus; survivor count closes the funnel") {
    val total = Tables.documents(spark, sf0001).count()
    val rows = Curation.filterFunnel(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5), "stable 5-row shape")
    assert(rows.map(_._3).sum == total, "first-kill attribution partitions the corpus")
    val remaining = rows.map(_._4)
    assert(remaining.zip(remaining.tail).forall { case (a, b) => a >= b },
      "funnel must be monotone non-increasing")
    assert(remaining.last == rows.last._3,
      "final n_remaining equals the survivor count")
    assert(rows.init.exists(_._3 > 0L), "at least one rule fires on the fixture")
  }

  test("length anomalies: fit and residuals match a driver-side OLS exactly") {
    // Brute-force the same closed form in Scala from collected (x, y) pairs;
    // the distributed result must be bit-identical (exact integer sums in,
    // identical IEEE expression out).
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars").cast("long"),
        size(split(col("text"), " ")).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.length.toLong
    val sx = docs.map(_._3).sum
    val sy = docs.map(_._2).sum
    val sxx = docs.map(d => d._3 * d._3).sum
    val sxy = docs.map(d => d._3 * d._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    def resid(y: Long, x: Long): Double = {
      // house display quantizer (Det.display) — same IEEE op sequence
      val r = math.floor((y.toDouble - (icept + slope * x.toDouble)) * 1e4 + 0.5) / 1e4
      r + 0.0
    }
    val expect = docs
      .map { case (id, y, x) => (id, x, resid(y, x)) }
      .sortBy { case (id, _, r) => (-math.abs(r), id) }
      .take(20)
    val got = Curation.lengthAnomalies(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect.toSeq)
    // slope must be physically sensible: chars grow with tokens, roughly
    // (mean word length + 1 separator) chars per token.
    assert(slope > 1.0 && slope < 20.0, s"implausible slope $slope")
  }

  test("length anomalies: OLS residuals over the whole corpus sum to ~zero") {
    // The defining property of least squares with an intercept. Run the
    // un-truncated residual map by reusing the operator at k = corpus size.
    val all = Curation.lengthAnomalies(spark, sf0001, k = Int.MaxValue).collect()
    val total = all.map(_.getDouble(2)).sum
    assert(math.abs(total) < 1.0, s"residual sum $total not ~0")
  }

  test("snapshot delta: statuses match a driver-side diff of the same snapshots") {
    val base = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val oldSnap = base.filter(_._1 % 13 != 3)
      .map { case (id, t, c) => (id, if (id % 7 == 2) t.reverse else t, c) }
    val newSnap = base.filter(_._1 % 17 != 5)
    val oldById = oldSnap.map(d => d._1 -> d).toMap
    val newById = newSnap.map(d => d._1 -> d).toMap
    val expect = (oldById.keySet ++ newById.keySet).toSeq.map { id =>
      val status = (oldById.get(id), newById.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(o), Some(n)) => if (o._2 == n._2) "unchanged" else "changed"
        case _ => fail("unreachable")
      }
      val chars = newById.get(id).orElse(oldById.get(id)).get._3
      (status, id, chars)
    }
    val expectAgg = expect.groupBy(_._1).map { case (s, rows) =>
      (s, rows.size.toLong, rows.map(_._3).sum,
        rows.map(_._2).min, rows.map(_._2).max)
    }.toSet
    val got = Curation.corpusDelta(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expectAgg)
    // all four statuses must actually occur, or the gate is vacuous
    assert(got.map(_._1) == Set("added", "removed", "changed", "unchanged"))
  }

  test("length anomalies: zero-variance corpus yields null residuals, not a crash") {
    import spark.implicits._
    // every doc has the same token count -> the OLS denominator is zero;
    // the nullif guard must surface null residuals instead of dividing
    val degenerate = Seq(
      (1L, "a b c", 5L), (2L, "d e f", 9L), (3L, "g h i", 7L))
      .toDF("doc_id", "text", "n_chars")
    val out = graft.operators.Curation.lengthAnomaliesOf(degenerate, k = 10).collect()
    assert(out.length == 3)
    assert(out.forall(_.isNullAt(2)), "residuals must be null when x has no variance")
  }

  test("property: snapshot delta statuses partition the id universe (seeded shapes)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 20 + rng.nextInt(60)
      val base = (0L until n.toLong).map(id =>
        (id, s"text-$id-${rng.nextInt(3)}", 10L + id % 7))
      val oldSnap = base.filter(_ => rng.nextDouble() > 0.2)
        .map { case (id, t, c) =>
          if (rng.nextDouble() < 0.3) (id, t + "-mutated", c) else (id, t, c) }
      val newSnap = base.filter(_ => rng.nextDouble() > 0.2)
      val got = graft.operators.Curation.snapshotDelta(
          oldSnap.toDF("doc_id", "text", "n_chars"),
          newSnap.toDF("doc_id", "text", "n_chars"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // partition law: every id in either snapshot appears exactly once...
      val oldIds = oldSnap.map(_._1).toSet
      val newIds = newSnap.map(_._1).toSet
      assert(got.keySet == (oldIds ++ newIds), s"trial $trial id coverage")
      // ...and its status is determined by membership + text equality
      val oldByIdT = oldSnap.map(d => d._1 -> d._2).toMap
      val newByIdT = newSnap.map(d => d._1 -> d._2).toMap
      got.foreach { case (id, status) =>
        val want = (oldByIdT.get(id), newByIdT.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(o), Some(nw)) => if (o == nw) "unchanged" else "changed"
          case _ => fail("unreachable")
        }
        assert(status == want, s"trial $trial id=$id")
      }
    }
  }

  test("snapshot delta: null text is presence-classified, not added/removed") {
    import spark.implicits._
    // doc 1 present in BOTH snapshots with a null text on one side: the
    // status must come from membership (changed), never from the null
    // digest (which would misread it as added/removed)
    val o = Seq((1L, Option.empty[String], 5L), (2L, Some("x"), 1L))
      .toDF("doc_id", "text", "n_chars")
    val n = Seq((1L, Some("now"), 3L), (2L, Some("x"), 1L))
      .toDF("doc_id", "text", "n_chars")
    val got = graft.operators.Curation.snapshotDelta(o, n)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged"), got.toString)
  }

  test("importance select: scores match a driver-side DSIR recompute exactly") {
    // Recompute the smoothed frequency-ratio scores in Scala from collected
    // tokens; the distributed result must be bit-identical (integer-scaled
    // per-token scores in, exact BIGINT sums out).
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "en", r.getString(2).split(" ", -1).toSeq))
    val rc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val tc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, isT, ts) =>
      ts.foreach { t => rc(t) += 1; if (isT) tc(t) += 1 }
    }
    val rtot = rc.values.sum; val ttot = tc.values.sum; val v = rc.size.toLong
    def score(t: String): Long =
      math.floor((tc(t) + 1) * (rtot + v) * 1e6 / ((rc(t) + 1) * (ttot + v)) + 0.5).toLong
    val expect = docs.filter(!_._2).map { case (id, _, ts) =>
      val s = ts.map(score).sum
      // avg_imp derivation mirrors the operator: floor(s/(100·n) + ½)/10⁴
      (id, ts.size.toLong, s, math.floor(s.toDouble / (100.0 * ts.size) + 0.5) / 1e4)
    }.sortBy { case (id, _, _, a) => (-a, id) }.take(50)
    val got = Curation.importanceSelect(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect.toSeq)
    // non-vacuity: scores must actually vary across the selected docs
    assert(got.map(_._4).distinct.size > 1, "flat importance scores")
  }

  test("importance select: planted distribution shift ranks target-like docs first") {
    import spark.implicits._
    // target docs are saturated with "aa"; among the raw pool, the doc made
    // of "aa" must outrank the doc sharing no vocabulary mass with target
    val frame = Seq(
      (1L, "tgt", "aa aa aa aa aa bb"),
      (2L, "tgt", "aa aa aa aa cc aa"),
      (10L, "raw", "aa aa aa aa aa aa"),
      (11L, "raw", "zz zz zz zz zz zz"),
      (12L, "raw", "aa zz aa zz aa zz"))
      .toDF("doc_id", "lang", "text")
    val got = Curation.importanceSelectOf(frame, col("lang") === "tgt", budget = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 12L, 11L), got.toString)
  }

  test("importance select: target documents never appear in the selection") {
    val targets = Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val sel = Curation.importanceSelect(spark, sf0001, budget = Int.MaxValue)
      .collect().map(_.getLong(0)).toSet
    assert(sel.intersect(targets).isEmpty)
    val nonTarget = Tables.documents(spark, sf0001).count() - targets.size
    assert(sel.size == nonTarget, "uncapped selection must cover the raw pool")
  }

  test("cluster keywords match a driver-side lift recompute over the model's assignments") {
    import graft.operators.Vectors
    // Take the operator's own cluster assignment as given (model-dependent),
    // then recompute counts and integer lift independently.
    val assigned = Vectors.assignCellsWith(
        Tables.embeddings(spark, sf0001), Vectors.kmeansModel(spark, sf0001))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].intValue).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .filter { case (id, _) => assigned.contains(id) }
    val clustCnt = scala.collection.mutable.Map[(Int, String), Long]().withDefaultValue(0L)
    val clustTot = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
    val corpusCnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    var ctot = 0L
    docs.foreach { case (id, ts) =>
      val c = assigned(id)
      ts.foreach { t =>
        clustCnt((c, t)) += 1; clustTot(c) += 1; corpusCnt(t) += 1; ctot += 1
      }
    }
    val expect = clustCnt.toSeq
      .filter(_._2 >= 3)
      .map { case ((c, t), cnt) =>
        (c, t, cnt, cnt * ctot * 1000000L / (clustTot(c) * corpusCnt(t)))
      }
      .groupBy(_._1).toSeq.flatMap { case (c, rows) =>
        rows.sortBy { case (_, t, _, lift) => (-lift, t) }
          .zipWithIndex.take(5)
          .map { case ((_, t, cnt, lift), i) => (c, i + 1, t, cnt, lift) }
      }
      .sortBy { case (c, rn, _, _, _) => (c, rn) }
    val got = Curation.clusterKeywords(spark, sf0001).collect()
      .map(r => (r.get(0).asInstanceOf[Number].intValue, r.getInt(1),
        r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    assert(got.nonEmpty && got.map(_._1).distinct.size > 1,
      "keyword table must cover multiple clusters")
  }

  test("cluster token counts: past the assignment broadcast ceiling the explode-first order is result-identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "zz zz"), (4L, "unembedded text"))
      .toDF("doc_id", "text")
    val assigned = Seq((1L, 0), (2L, 1), (3L, 0)).toDF("doc_id", "cluster")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
      df.collect().map(r =>
        (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val fast = rows(Curation.clusterTokenCountsOf(docs, assigned))
    assert(fast == Set(
      ("0", "a", 2L), ("0", "b", 1L), ("0", "zz", 2L),
      ("1", "b", 1L), ("1", "c", 1L)), fast.toString)
    val conf = spark.conf
    val prevAuto = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAdaptive = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      // auto-broadcast off too, so ceiling=0 genuinely exercises the
      // shuffled explode-first join (at real scale a billions-of-rows
      // assignment table is past the auto threshold anyway)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val slow = Curation.clusterTokenCountsOf(docs, assigned, broadcastMaxRows = 0)
      val got = rows(slow)
      assert(!slow.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        s"over-ceiling path must not broadcast:\n${slow.queryExecution.executedPlan}")
      assert(got == fast, s"fallback drifted: $got vs $fast")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      prevAdaptive match {
        case Some(v) => conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    // fixture cross-check: both orders agree on the real (docs × model) pair
    val fdocs = Tables.documents(spark, sf0001)
    val fassigned = graft.operators.Vectors.assignCellsWith(
        Tables.embeddings(spark, sf0001),
        graft.operators.Vectors.kmeansModel(spark, sf0001))
      .select(col("vec_id").as("doc_id"), col("cell").as("cluster"))
    val a = rows(Curation.clusterTokenCountsOf(fdocs, fassigned))
    val b = rows(Curation.clusterTokenCountsOf(fdocs, fassigned, broadcastMaxRows = 0))
    assert(a.nonEmpty && b == a, s"fixture fallback drifted: ${b.size} vs ${a.size}")
  }

  test("token drift matches a driver-side recompute of the two snapshots") {
    val base = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def counts(texts: Seq[String]): (Map[String, Long], Long) = {
      val m = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      var tot = 0L
      texts.foreach(_.split(" ", -1).foreach { t => m(t) += 1; tot += 1 })
      (m.toMap.withDefaultValue(0L), tot)
    }
    val (oc, otot) = counts(base.filter(_._1 % 13 != 3)
      .map { case (id, t) => if (id % 7 == 2) t.reverse else t }.toSeq)
    val (nc, ntot) = counts(base.filter(_._1 % 17 != 5).map(_._2).toSeq)
    val expect = (oc.keySet ++ nc.keySet).toSeq.map { t =>
      val op = oc(t) * 1000000L / otot
      val np = nc(t) * 1000000L / ntot
      (t, oc(t), nc(t), op, np, math.abs(np - op))
    }.sortBy { case (t, _, _, _, _, d) => (-d, t) }.take(30)
    val got = graft.operators.Curation.tokenDrift(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the reversed-text docs guarantee genuinely drifted tokens
    assert(got.head._6 > 0, "top drift must be non-zero")
  }

  test("property: importance select matches the driver recompute on seeded random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      val n = 15 + rng.nextInt(25)
      val frame = (0L until n.toLong).map { id =>
        val len = 3 + rng.nextInt(10)
        val text = Seq.fill(len)(alphabet(rng.nextInt(alphabet.size))).mkString(" ")
        (id, rng.nextDouble() < 0.3, text)
      }
      val df = frame.toDF("doc_id", "is_tgt", "text")
      val rc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val tc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      frame.foreach { case (_, isT, text) =>
        text.split(" ", -1).foreach { t => rc(t) += 1; if (isT) tc(t) += 1 }
      }
      val rtot = rc.values.sum; val ttot = tc.values.sum; val v = rc.size.toLong
      def score(t: String): Long =
        math.floor((tc(t) + 1) * (rtot + v) * 1e6 / ((rc(t) + 1) * (ttot + v)) + 0.5).toLong
      val expect = frame.filter(!_._2).map { case (id, _, text) =>
        val ts = text.split(" ", -1).toSeq
        val s = ts.map(score).sum
        val avg = math.floor(s.toDouble / (100.0 * ts.size) + 0.5) / 1e4
        (id, ts.size.toLong, s, avg)
      }.sortBy { case (id, _, _, a) => (-a, id) }.take(10)
      val got = Curation.importanceSelectOf(df, col("is_tgt"), budget = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == expect, s"trial $trial")
    }
  }

  test("property: drift of a corpus against itself is zero for every token") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val frame = (0L until 25L).map { id =>
      (id, Seq.fill(4 + rng.nextInt(8))(s"t${rng.nextInt(9)}").mkString(" "))
    }.toDF("doc_id", "text")
    // honor tokenPpm's pass-a-PINNED-frame contract (the shape callers copy)
    val a = Curation.tokenPpm(graft.operators.Materialize.stable(
      Curation.snapshotTokenCounts(frame, "old")), "old")
    val b = Curation.tokenPpm(graft.operators.Materialize.stable(
      Curation.snapshotTokenCounts(frame, "new")), "new")
    try {
      val rows = Curation.driftJoin(a, b, "old", "new", k = 1000).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(5) == 0L, s"token ${r.getString(0)} drifted against itself")
        assert(r.getLong(1) == r.getLong(2), "counts must agree side-to-side")
      }
    } finally graft.operators.Materialize.releaseAll()
  }

  test("gopher rules: flags match a driver recompute; integer thresholds at the boundary") {
    val got = Curation.gopherRules(spark, sf0001).collect()
      .map(r => (r.getLong(0), (1 to 8).map(r.getLong).toList)).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    val stop = Set("the", "be", "to", "of", "and", "that", "have", "with")
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val nt = ws.length.toLong
      val sumLen = ws.map(_.length.toLong).sum
      val nAlpha = ws.count(_.exists(_.isLetter)).toLong
      val nStop = ws.toSet.count(stop).toLong
      val nSym = text.count(_ == '#').toLong +
        "\\.\\.\\.".r.findAllIn(text).size.toLong
      val want = List(
        nt, nStop,
        if (nt >= 50 && nt <= 100000) 1L else 0L,
        if (sumLen >= 3 * nt && sumLen <= 10 * nt) 1L else 0L,
        if (5 * nAlpha >= 4 * nt) 1L else 0L,
        if (nStop >= 1) 1L else 0L,
        if (10 * nSym < nt) 1L else 0L)
      assert(got(id).take(7) == want, s"doc $id: got ${got(id)} want $want")
      assert(got(id)(7) == want.drop(2).product, s"doc $id keep")
    }
    // both flag values must occur for the word-count rule (the fixture
    // straddles the 50-word floor), so the gate differentiates
    val okWords = got.values.map(_(2)).toSet
    assert(okWords == Set(0L, 1L), s"ok_words degenerate: $okWords")
  }

  test("snapshot delta API: disjoint snapshots are pure added + removed") {
    val docs = Tables.documents(spark, sf0001)
    val o = docs.filter(col("doc_id") < 100)
    val n = docs.filter(col("doc_id") >= 100)
    val counts = Curation.snapshotDelta(o, n)
      .groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("added", "removed"))
    assert(counts.values.sum == docs.count())
  }
}
