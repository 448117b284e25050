package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.ColumnOps
import graft.operators.{Dedup, TextAnalysis}

/** Property-based tests mirroring the reference's hypothesis suites
  * (test_polars_requests.py:267-309, test_polars_utils.py:63-72):
  * schema preservation, row-count preservation, null handling —
  * driven by generated inputs rather than fixtures.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic generator sampling (scalatestplus bridge is not in
    * the offline cache; raw ScalaCheck with a fixed seed gives the
    * same property coverage reproducibly).
    */
  private def forAll[T](g: Gen[T], cases: Int = 8)(body: T => Unit): Unit =
    (0 until cases).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(" ")))
      .map(_.mkString(" ").take(200))

  test("fmt: output is null iff any argument is null") {
    forAll(Gen.listOfN(20, Gen.option(Gen.alphaNumStr.map(_.take(8))))) {
      vals =>
        val df = vals.toDF("v")
          .select(col("v"), ColumnOps.fmt("pre-{}-post", col("v")).as("f"))
        df.collect().foreach { r =>
          assert(r.isNullAt(1) === r.isNullAt(0))
          if (!r.isNullAt(1)) assert(r.getString(1) === s"pre-${r.getString(0)}-post")
        }
    }
  }

  test("extractFirst: null exactly when the pattern misses") {
    forAll(Gen.listOfN(20, Gen.alphaNumStr.map(_.take(10)))) { vals =>
      val df = vals.toDF("v")
        .select(col("v"), ColumnOps.extractFirst(col("v"), "(\\d+)").as("x"))
      df.collect().foreach { r =>
        val expected = "\\d+".r.findFirstIn(r.getString(0))
        assert(Option(r.getString(1)) === expected)
      }
    }
  }

  test("shingleHashes: row count preserved, every set non-empty for non-empty text") {
    forAll(Gen.listOfN(10, asciiText.retryUntil(_.trim.nonEmpty))) { texts =>
      val df = texts.toDF("t")
        .select(Dedup.shingleHashes(col("t"), 3).as("sh"))
      val rows = df.collect()
      assert(rows.length === texts.length)
      rows.foreach(r => assert(r.getSeq[Long](0).nonEmpty))
    }
  }

  test("simhash of identical text is identical; tokenCount >= 1") {
    forAll(asciiText.retryUntil(_.trim.nonEmpty)) { t =>
      val df = Seq(t, t).toDF("t").select(
        Dedup.simhash(col("t")).as("s"),
        TextAnalysis.tokenCount(col("t")).as("n"))
      val rows = df.collect()
      assert(rows(0).getLong(0) === rows(1).getLong(0))
      assert(rows(0).getInt(1) >= 1)
    }
  }

  test("sampleExact: n rows out for any n <= size, all distinct input rows") {
    forAll(Gen.chooseNum(1, 50)) { n =>
      val df = (1 to 50).toDF("v")
      val out = graft.operators.Frames.sampleExact(df, n, seed = 1L)
        .collect().map(_.getInt(0))
      assert(out.length === n && out.distinct.length === n)
    }
  }

  test("hashSplit: every row lands in exactly one split, fractions within tolerance") {
    forAll(Gen.chooseNum(1, 8), cases = 4) { k =>
      val fracs = (1 to k).map(i => s"s$i" -> 1.0 / k)
      // 40k sequential ids: at 1/10000 bucket granularity this hits
      // every bucket, so a short final bound (the thirds-rounding bug:
      // 3x3333 = 9999) would surface as a null split
      val df = (1L to 40000L).toDF("id")
      val out = graft.operators.Frames.hashSplit(df, "id", fracs)
      assert(out.filter(col("split").isNull).count() === 0)
      assert(out.count() === 40000)
      val counts = out.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum === 40000L)
      counts.values.foreach(c =>
        assert(math.abs(c.toDouble / 40000 - 1.0 / k) < 0.03, s"k=$k counts=$counts"))
    }
  }

  test("asofJoin backward equals the naive latest-at-or-before subquery on random data") {
    val gen = for {
      lefts <- Gen.listOfN(30, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 1000L)))
      rights <- Gen.listOfN(20, Gen.zip(Gen.chooseNum(1L, 5L), Gen.chooseNum(0L, 1000L)))
    } yield (lefts, rights)
    forAll(gen, cases = 5) { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("event_id", "k", "ts")
      val r = rights.map { case (k, t) => (k, new java.sql.Timestamp(t * 1000)) }
        .distinct.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("k", "rts", "rid")
      val got = graft.operators.Temporal.asofJoin(l, r, Seq("k"), "ts", "rts")
        .select("event_id", "rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      val naive = l.as("l").join(r.as("r"),
          col("l.k") === col("r.k") && col("l.ts") >= col("r.rts"), "left")
        .groupBy(col("l.event_id").as("event_id"))
        .agg(max(struct(col("r.rts"), col("r.rid"))).as("m"))
        .select(col("event_id"), col("m.rid")).collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
      assert(got === naive)
    }
  }

  test("topkRows equals sort-take on random groups for any k") {
    forAll(Gen.chooseNum(1, 6), cases = 4) { k =>
      val rows = (0 until 300).map(i =>
        ((i * 2654435761L % 7).toString, (i * 40503L % 1000).toDouble, i.toLong))
      val df = rows.toDF("g", "score", "id")
      val agg = df.groupBy(col("g"))
        .agg(graft.functions.NativeFunctions.topkRows(
          struct((-col("score")).as("ns"), col("id")), struct(col("id")), k).as("tk"))
        .select(col("g"), explode(col("tk")).as("p"))
        .select(col("g"), col("p.payload.id").as("id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // .toSeq first: Map#flatMap over tuple results would rebuild a
      // Map and silently keep one entry per group
      val naive = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(k).map(r => (g, r._3))
      }.toSet
      assert(agg === naive)
    }
  }

  test("PqAdcScore equals the manual table-lookup sum for any valid codes") {
    val ksub = 8
    val m = 5
    val gen = for {
      codes <- Gen.listOfN(m, Gen.chooseNum(0, ksub - 1))
      tab <- Gen.listOfN(m * ksub, Gen.chooseNum(-1000000L, 1000000L))
    } yield (codes, tab)
    forAll(gen) { case (codes, tab) =>
      val expected = codes.zipWithIndex.map { case (c, j) => tab(j * ksub + c) }.sum
      val got = Seq((codes, tab)).toDF("codes", "tab")
        .select(graft.functions.NativeFunctions.pqAdcScore(
          col("codes"), col("tab"), ksub).as("s"))
        .head().getLong(0)
      assert(got === expected)
    }
  }

  test("domainMix: output mix never exceeds target proportion by more than hash granularity") {
    val gen = for {
      wa <- Gen.chooseNum(1, 9)
      wb <- Gen.chooseNum(1, 9)
    } yield (wa / 10.0, wb / 10.0)
    forAll(gen, cases = 4) { case (wa, wb) =>
      val df = (1L to 400L).map(i => (i, if (i % 3 == 0) "a" else "b"))
        .toDF("id", "dom")
      val weights = Map("a" -> wa, "b" -> wb)
      val out = graft.operators.Frames.domainMix(df, "dom", "id", weights)
        .groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val in = df.groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // the limiting domain survives whole
      val limiting = weights.keys.minBy(k => in(k) / weights(k))
      assert(out(limiting) === in(limiting))
      // nothing is oversampled and proportions track targets loosely
      out.foreach { case (k, n) => assert(n <= in(k)) }
      val total = out.values.sum.toDouble
      weights.foreach { case (k, w) =>
        val share = out.getOrElse(k, 0L) / total
        assert(share <= w / (wa + wb) + 0.15, s"$k over target: $share vs ${w / (wa + wb)}")
      }
    }
  }

  test("native repetitionSignals equals the HOF twin on generated documents") {
    // structure-heavy generator: newline runs (line/para splits), tabs
    // (space-only-trim sensitivity), forced repeats (dup/top-gram
    // paths), multi-space gaps — the shapes the 15 signals dispatch on
    val piece: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(5)), Gen.const(" "), Gen.const("\n"),
      Gen.const("\n\n"), Gen.const("\t"), Gen.const("dup dup dup"),
      Gen.const("a b a b"))
    val doc: Gen[String] =
      Gen.listOfN(25, piece).map(_.mkString(" ").take(400))
    forAll(Gen.listOfN(12, doc), cases = 6) { docs =>
      val both = docs.toDF("text").select(
        TextAnalysis.repetitionSignals(col("text")).as("n"),
        TextAnalysis.repetitionSignalsHof(col("text")).as("h"))
      both.collect().foreach { r =>
        assert(r.getStruct(0) === r.getStruct(1), s"diverged on: $r")
      }
    }
  }

  test("sourceHealthReport: per-source rows sum to corpus totals, partition-invariant") {
    val ws = TextAnalysis.demoQualityWeights(256)
    forAll(Gen.listOfN(30, asciiText), cases = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, s"src${i % 3}", if (i % 2 == 0) "en" else "fr") }
        .toDF("doc_id", "text", "source", "lang")
      val rep = TextAnalysis.sourceHealthReport(docs, "doc_id", "text",
        "source", "lang", ws)
      val rows = rep.collect()
      // the card partitions the corpus: per-source doc counts sum to it
      assert(rows.map(_.getAs[Long]("n_docs")).sum === texts.length.toLong)
      // keep + pii + dup counts can never exceed the source's docs
      rows.foreach { r =>
        val n = r.getAs[Long]("n_docs")
        assert(r.getAs[Long]("n_dup_docs") <= n)
        assert(r.getAs[Long]("n_pii_docs") <= n)
        assert(r.getAs[Long]("n_keep_quality") <= n)
        assert(r.getAs[Long]("n_langs") >= 1L)
      }
      // partition-invariance: a different physical layout produces the
      // identical card (no accidental partition-local aggregation)
      val re = TextAnalysis.sourceHealthReport(docs.repartition(7), "doc_id",
        "text", "source", "lang", ws)
      assert(re.orderBy("source").collect().toSeq ===
        rep.orderBy("source").collect().toSeq)
    }
  }

  test("duplicatedSpans equals a brute-force reference on random tiny-vocab corpora") {
    val minLen = 3
    // tiny vocab forces duplicated windows; varying doc lengths cover
    // the below-minLen and exact-minLen edges
    val corpusGen: Gen[List[(Long, String)]] = for {
      nDocs <- Gen.choose(4, 12)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 24)
        toks <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen, cases = 6) { corpus =>
      // brute force: count every window across the corpus, keep
      // positions whose window repeats, merge overlapping/touching
      val windows = corpus.flatMap { case (id, text) =>
        val ts = text.trim.split("\\s+").toSeq
        if (ts.length >= minLen)
          (0 to ts.length - minLen).map(p => (id, p, ts.slice(p, p + minLen).mkString("")))
        else Seq.empty
      }
      val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = windows.filter(w => counts(w._3) > 1)
        .groupBy(_._1).flatMap { case (id, ws) =>
          val ps = ws.map(_._2).sorted
          val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
          ps.foreach { p =>
            spans.lastOption match {
              case Some((s0, last)) if p <= last + minLen => spans(spans.length - 1) = (s0, p)
              case _ => spans += ((p, p))
            }
          }
          spans.map { case (s0, last) => (id, s0.toLong, (last - s0 + minLen).toLong) }
        }.toSet
      val got = Dedup.duplicatedSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", minLen)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"corpus: $corpus")
    }
  }

  test("trainBucketWeights: weight mass balances the labeled occurrence counts") {
    // invariant: sum over buckets of weight == (token occurrences in
    // label-true docs) - (occurrences in label-false docs), for ANY
    // corpus and bucket count — hash collisions move mass between
    // buckets, never create or destroy it
    val docGen = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, for {
        t <- asciiText
        en <- Gen.oneOf(true, false)
      } yield (t, en))
    } yield docs.zipWithIndex.map { case ((t, en), i) => (i.toLong, t, en) }
    forAll(docGen, cases = 6) { docs =>
      val df = docs.toDF("doc_id", "text", "is_en")
      val artifact = TextAnalysis.trainBucketWeights(df, "text", col("is_en"), 32)
      val totalWeight = artifact.agg(coalesce(sum(col("weight")), lit(0L)))
        .head().getLong(0)
      val expected = docs.map { case (_, t, en) =>
        val k = t.trim.split("\\s+").count(_.nonEmpty).toLong
        if (en) k else -k
      }.sum
      assert(totalWeight === expected, s"docs: $docs")
      // and scoring is additive in document concatenation: the scorer
      // is a sum over token occurrences, so score(a ++ " " ++ b) ==
      // score(a) + score(b) under whitespace tokenization
      val ws = TextAnalysis.loadWeights(artifact, 32)
      docs.take(2) match {
        case Seq((_, a, _), (_, b, _)) =>
          val scored = TextAnalysis.hashedLinearScore(
              Seq((0L, a), (1L, b), (2L, a + " " + b)).toDF("doc_id", "text"),
              "doc_id", "text", ws)
            .collect().map(r => r.getLong(0) -> r.getAs[Long]("score")).toMap
          assert(scored(2L) === scored(0L) + scored(1L))
        case _ => ()
      }
    }
  }

  test("bigramLogProbInterp: the mixing FRACTION determines the result exactly") {
    // (k·num, k·den) and (num, den) must agree bit-for-bit for any
    // scaling k: (k·num·p1m + k·(den−num)·p2m) div (k·den) ==
    // (num·p1m + (den−num)·p2m) div den for nonneg operands —
    // the operator's contract is the fraction λ, not its
    // representation. Degenerate fractions hit the pure-ML and
    // pure-unigram paths through the same mixing expression.
    val corpusGen = for {
      n <- Gen.choose(2, 8)
      docs <- Gen.listOfN(n,
        Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(corpusGen, cases = 4) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      def run(num: Long, den: Long): Map[Long, (Long, Long)] =
        TextAnalysis.bigramLogProbInterp(df, "doc_id", "text", num, den)
          .collect().map(r => r.getLong(0) ->
            ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_lp_micro")))).toMap
      assert(run(3L, 4L) === run(6L, 8L))
      assert(run(1L, 1L) === run(5L, 5L))
      assert(run(0L, 1L) === run(0L, 7L))
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("arraySum: element-wise totals on random vectors; loud on bad shapes") {
    import graft.functions.NativeFunctions.arraySum
    val vecGen = Gen.listOfN(16, Gen.listOfN(5, Gen.chooseNum(-1000L, 1000L)))
    forAll(vecGen, cases = 4) { vecs =>
      val got = vecs.toDF("v").agg(arraySum(col("v"), 5)).head()
        .getSeq[Long](0)
      val want = (0 until 5).map(i => vecs.map(_(i)).sum)
      assert(got === want)
    }
    // null ARRAYS are skipped (like sum); per-group state is len longs
    val withNull = Seq(Some(Seq(1L, 2L)), None, Some(Seq(3L, 4L)))
      .toDF("v")
    assert(withNull.agg(arraySum(col("v"), 2)).head().getSeq[Long](0)
      === Seq(4L, 6L))
    // length mismatch and null ELEMENTS fail loudly, never corrupt
    intercept[Exception] {
      Seq(Seq(1L, 2L)).toDF("v").agg(arraySum(col("v"), 3)).collect()
    }
    intercept[Exception] {
      Seq(Seq[java.lang.Long](1L, null)).toDF("v")
        .agg(arraySum(col("v"), 2)).collect()
    }
  }

  test("arrayMax: element-wise maxima, idempotent under duplication; loud on bad shapes") {
    import graft.functions.NativeFunctions.arrayMax
    val vecGen = Gen.listOfN(16, Gen.listOfN(5, Gen.chooseNum(0L, 1000L)))
    forAll(vecGen, cases = 4) { vecs =>
      val got = vecs.toDF("v").agg(arrayMax(col("v"), 5)).head()
        .getSeq[Long](0)
      val want = (0 until 5).map(i => vecs.map(_(i)).max)
      assert(got === want)
      // idempotence: duplicating every row cannot change a max —
      // the property that makes streaming state merges safe
      val doubled = (vecs ++ vecs).toDF("v").agg(arrayMax(col("v"), 5)).head()
        .getSeq[Long](0)
      assert(doubled === want)
    }
    intercept[Exception] {
      Seq(Seq(1L, 2L)).toDF("v").agg(arrayMax(col("v"), 3)).collect()
    }
    intercept[Exception] {
      Seq(Seq[java.lang.Long](1L, null)).toDF("v")
        .agg(arrayMax(col("v"), 2)).collect()
    }
  }

  test("mortonInterleave2 round-trips: de-interleaved bits recover both inputs") {
    import graft.operators.Layout
    val pairGen = for {
      a <- Gen.chooseNum(0L, 65535L)
      b <- Gen.chooseNum(0L, 65535L)
    } yield (a, b)
    forAll(Gen.listOfN(64, pairGen), cases = 4) { pairs =>
      val out = pairs.toDF("a", "b")
        .select(col("a"), col("b"),
          Layout.mortonInterleave2(col("a"), col("b"), 16).as("z"))
        .collect()
      out.foreach { r =>
        val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        var (ra, rb) = (0L, 0L)
        (0 until 16).foreach { i =>
          ra |= ((z >> (2 * i)) & 1L) << i
          rb |= ((z >> (2 * i + 1)) & 1L) << i
        }
        assert(ra === a && rb === b, s"z=$z failed to round-trip ($a,$b)")
      }
    }
  }

  test("mortonInterleaveN round-trips for 3 dimensions and reduces to the 2-D form") {
    import graft.operators.Layout
    val tripleGen = Gen.listOfN(3, Gen.chooseNum(0L, 1023L))
    forAll(Gen.listOfN(32, tripleGen), cases = 3) { triples =>
      val out = triples.map { case List(a, b, c) => (a, b, c) }
        .toDF("a", "b", "c")
        .select(col("a"), col("b"), col("c"),
          Layout.mortonInterleaveN(Seq(col("a"), col("b"), col("c")), 10).as("z"),
          Layout.mortonInterleaveN(Seq(col("a"), col("b")), 10).as("z2"),
          Layout.mortonInterleave2(col("a"), col("b"), 10).as("z2ref"))
        .collect()
      out.foreach { r =>
        val z = r.getLong(3)
        val rec = (0 until 3).map { j =>
          (0 until 10).map(i => ((z >> (i * 3 + j)) & 1L) << i).reduce(_ | _)
        }
        assert(rec === Seq(r.getLong(0), r.getLong(1), r.getLong(2)),
          s"3-D round-trip failed for z=$z")
        assert(r.getLong(4) === r.getLong(5), "N=2 must equal the 2-D form")
      }
    }
  }

  test("quantizeLinear: in-range, monotone, endpoints exact for random domains") {
    import graft.operators.Layout
    val domGen = for {
      lo <- Gen.chooseNum(-100000L, 100000L)
      span <- Gen.chooseNum(1L, 2000000L)
    } yield (lo, lo + span)
    forAll(domGen, cases = 6) { case (lo, hi) =>
      val xs = Seq(lo, hi, lo + (hi - lo) / 3, lo + (hi - lo) / 2, hi - 1L)
        .distinct.sorted
      val qs = xs.toDF("x")
        .select(Layout.quantizeLinear(col("x"), lo, hi, 12).as("q"))
        .collect().map(_.getLong(0))
      assert(qs.head === 0L, s"min must land on 0 for [$lo,$hi]")
      assert(qs.last === 4095L, s"max must land on 2^12-1 for [$lo,$hi]")
      assert(qs.forall(q => q >= 0L && q <= 4095L))
      // xs sorted -> buckets sorted (monotone mapping)
      assert(qs.sameElements(qs.sorted), s"non-monotone: ${qs.toSeq}")
    }
  }

  test("sourceTermDrift is invariant under input partitioning") {
    val corpusGen = for {
      n <- Gen.choose(4, 10)
      docs <- Gen.listOfN(n, for {
        words <- Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e", "zz"))
        src <- Gen.oneOf("s1", "s2", "s3")
      } yield (words.mkString(" "), src))
    } yield docs.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
    forAll(corpusGen, cases = 4) { corpus =>
      val df = corpus.toDF("doc_id", "text", "source")
      def run(parts: Int): Map[String, Long] =
        TextAnalysis.sourceTermDrift(df.repartition(parts), "source", "text",
            topK = 3)
          .collect().map(r => r.getString(0) -> r.getAs[Long]("js_micro")).toMap
      // long sums of per-term floors: partitioning can never move the
      // result (the property float accumulation would violate)
      assert(run(1) === run(7))
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
