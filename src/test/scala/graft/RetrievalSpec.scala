package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf = Tables.table(spark, TestSpark.sfDir, "documents")

  /** Independent JVM replay of BM25 from raw strings — plain Scala
    * maps, no Spark — in the exact floor(term·1e6)-then-sum integer
    * discipline the operator defines. The differential oracle for
    * every scored pair, not just the top k.
    */
  private def bm25Replay(docs: Seq[(Long, String)],
                         probes: Seq[(Long, Seq[String])],
                         k1: Double, b: Double): Map[(Long, Long), (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty) }.toMap
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, g) => w -> g.size.toLong } }
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val nDocs = dl.size.toLong
    val total = dl.values.sum
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((qid, terms) <- probes; term <- terms.distinct;
         (docId, m) <- tf if m.contains(term)) {
      val t = m(term).toDouble
      val idf = math.log(1.0 + (nDocs.toDouble - df(term) + 0.5) / (df(term).toDouble + 0.5))
      val ts = math.floor(idf * (t * (k1 + 1.0)) /
        (t + k1 * ((1.0 - b) + b * dl(docId).toDouble * nDocs / total)) * 1000000.0).toLong
      val (s0, n0) = out.getOrElse((qid, docId), (0L, 0L))
      out((qid, docId)) = (s0 + ts, n0 + 1)
    }
    out.toMap
  }

  test("bm25TopK matches an independent JVM replay on corpus docs") {
    val docs = docsDf.limit(80).select("doc_id", "text")
    val raw = docs.as[(Long, String)].collect().toSeq
    val probes = raw.filter(_._1 % 10 == 0).map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty).take(5) }
    val probesDf = probes.toDF("query_id", "qterms")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        probesDf, "query_id", "qterms", k = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val want = bm25Replay(raw, probes, 1.2, 0.75)
    assert(got.keySet === want.keySet)
    got.foreach { case (key, v) => assert(v === want(key), s"pair $key") }
  }

  test("bm25TopKExpanded: feedback terms pull in docs the raw query cannot reach") {
    // doc 1 is the only original match for "alpha"; it also carries
    // "shared" (thrice — the heaviest feedback term), which doc 2
    // carries too. doc 3 shares nothing. After expansion, doc 2 must
    // enter the results; before it, it cannot.
    val docs = Seq(
      (1L, "alpha shared shared shared filler"),
      (2L, "shared shared other words here"),
      (3L, "completely unrelated text body")).toDF("doc_id", "text")
    val probes = Seq((100L, Seq("alpha"))).toDF("query_id", "qterms")
    val plain = Retrieval.bm25TopK(docs, "doc_id", "text",
      probes, "query_id", "qterms", k = 10).collect()
    assert(plain.map(_.getLong(2)).toSet === Set(1L))
    val exp = Retrieval.bm25TopKExpanded(docs, "doc_id", "text",
      probes, "query_id", "qterms", k = 10, kFb = 1, nExpand = 1).collect()
    assert(exp.map(_.getLong(2)).toSet === Set(1L, 2L),
      "expansion must recall doc 2 via the voted term")
    // the expanded run must equal bm25TopK over the manually expanded
    // query (original + the heaviest new feedback term, "shared")
    val manual = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq((100L, Seq("alpha", "shared"))).toDF("query_id", "qterms"),
        "query_id", "qterms", k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(exp.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      === manual)
  }

  test("bm25TopKExpanded: nExpand=0 degenerates to plain bm25TopK; no-match queries keep original terms") {
    val docs = docsDf.limit(60).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        slice(split(trim(col("text")), "\\s+"), 1, 5).as("qterms"))
    val a = Retrieval.bm25TopKExpanded(docs, "doc_id", "text",
        probes, "query_id", "qterms", k = 5, kFb = 3, nExpand = 0)
      .collect().map(_.toSeq).toSet
    val b = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qterms", k = 5)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    // a query matching nothing survives both passes empty (no crash,
    // no rows)
    val ghost = Seq((999L, Seq("zzz_not_in_corpus")))
      .toDF("query_id", "qterms")
    assert(Retrieval.bm25TopKExpanded(docs, "doc_id", "text",
      ghost, "query_id", "qterms", k = 5).isEmpty)
  }

  test("ranks are dense 1..k, scores non-increasing, ties on doc_id") {
    val docs = docsDf.select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        slice(split(trim(col("text")), "\\s+"), 1, 5).as("qterms"))
    val rows = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qterms", k = 10)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      val keys = sorted.map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(keys === keys.sorted, "ordering must be (score desc, doc_id asc)")
    }
  }

  test("result is invariant to input partitioning") {
    val docs = docsDf.limit(120).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 40 === 0)
      .select(col("doc_id").as("query_id"),
        slice(split(trim(col("text")), "\\s+"), 1, 5).as("qterms"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(d, "doc_id", "text", probes, "query_id", "qterms", k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(docs) === run(docs.repartition(13)))
  }

  test("a document sharing no probe term never appears") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
                   (3L, "alpha zeta")).toDF("doc_id", "text")
    val probes = Seq((10L, Seq("alpha"))).toDF("query_id", "qterms")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qterms", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("duplicate probe terms collapse to set semantics") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha alpha beta")).toDF("doc_id", "text")
    val once = Seq((10L, Seq("alpha"))).toDF("query_id", "qterms")
    val twice = Seq((10L, Seq("alpha", "alpha"))).toDF("query_id", "qterms")
    def run(p: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(docs, "doc_id", "text", p, "query_id", "qterms", k = 10)
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(run(once) === run(twice))
  }

  test("idf ordering: rarer terms score higher at equal tf and dl") {
    // 4 docs; "rare" in one doc, "common" in three; probe doc 1 holds
    // both with tf=1 and all docs same length -> rare term's
    // contribution must exceed common's
    val docs = Seq((1L, "rare common x"), (2L, "common y z"),
                   (3L, "common p q"), (4L, "a b c")).toDF("doc_id", "text")
    val pRare = Seq((10L, Seq("rare"))).toDF("query_id", "qterms")
    val pCommon = Seq((11L, Seq("common"))).toDF("query_id", "qterms")
    def score1(p: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(docs, "doc_id", "text", p, "query_id", "qterms", k = 10)
        .filter(col("doc_id") === 1L).select("score_micro").as[Long].head()
    assert(score1(pRare) > score1(pCommon))
  }

  test("mmrRerank matches an independent JVM replay of the greedy rounds") {
    import graft.operators.Similarity
    val emb = Tables.table(spark, TestSpark.sfDir, "embeddings").limit(200)
    val queries = emb.filter(col("vec_id") % 40 === 0)
    val sl = Similarity.bruteForceTopK(emb, queries, k = 15)
      .select(col("query_id"), col("id"), col("cos").as("rel"))
    val cands = sl.join(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")), Seq("id"))
    val got = Retrieval.mmrRerank(cands, k = 4, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // plain-Scala replay with the same double ops
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.zip(b).foreach { case (x0, y0) =>
        val x = x0.toDouble; val y = y0.toDouble
        dot += x * y; na += x * x; nb += y * y }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val raw = cands.collect().map(r => (r.getLong(1), r.getLong(0),
      r.getDouble(2), r.getSeq[Float](3)))
    val want = raw.groupBy(_._1).flatMap { case (q, cs) =>
      var rem = cs.map(c => (c._2, c._3, c._4)).toList
      var sel = List.empty[(Long, Double, Double, Seq[Float])]
      (1 to 4).flatMap { rank =>
        if (rem.isEmpty) Nil else {
          val scored = rem.map { case (id, rel, v) =>
            val maxSim = if (sel.isEmpty) 0.0
              else sel.map(s => cos(v, s._4)).max
            (0.7 * rel - (1.0 - 0.7) * maxSim, -id, (id, rel, v))
          }
          val best = scored.maxBy(s => (s._1, s._2))
          sel = sel :+ (best._3._1, best._3._2, best._1, best._3._3)
          rem = rem.filterNot(_._1 == best._3._1)
          Seq((q, rank) -> (best._3._1, best._3._2, best._1))
        }
      }
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (key, v) => assert(v === want(key), s"at $key") }
  }

  test("mmrRerank prefers a diverse candidate over a redundant near-copy") {
    // query-relative: two near-identical high-rel candidates, one
    // moderately relevant orthogonal candidate. Pure relevance ranks
    // the twins 1-2; MMR must interleave the diverse one at rank 2.
    val v1 = Seq(1.0f, 0.0f, 0.0f)
    val v1b = Seq(0.999f, 0.001f, 0.0f)
    val v2 = Seq(0.0f, 1.0f, 0.0f)
    val cands = Seq(
      (7L, 1L, 0.95, v1), (7L, 2L, 0.94, v1b), (7L, 3L, 0.60, v2))
      .toDF("query_id", "id", "rel", "vec")
    val out = Retrieval.mmrRerank(cands, k = 3, lambda = 0.5)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(out === Seq(1L, 3L, 2L))
  }

  test("mmrRerank handles shortlists smaller than k without nulls") {
    val cands = Seq((1L, 10L, 0.9, Seq(1.0f, 0.0f)),
                    (1L, 11L, 0.8, Seq(0.0f, 1.0f)))
      .toDF("query_id", "id", "rel", "vec")
    val rows = Retrieval.mmrRerank(cands, k = 5).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2))
  }

  test("bm25QueryDiagnostics summarizes depth, best and spread") {
    val docs = docsDf.limit(100).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"),
        slice(split(trim(col("text")), "\\s+"), 1, 5).as("qterms"))
    val topk = Retrieval.bm25TopK(docs, "doc_id", "text",
      probes, "query_id", "qterms", k = 10)
    val byQ = topk.collect().groupBy(_.getLong(0))
    val diag = Retrieval.bm25QueryDiagnostics(topk).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(diag.keySet === byQ.keySet)
    byQ.foreach { case (q, g) =>
      val d = diag(q)
      assert(d.getInt(1) === g.map(_.getInt(1)).max)
      val best = g.minBy(_.getInt(1))
      assert(d.getLong(2) === best.getLong(3))
      assert(d.getLong(5) === best.getLong(3) - g.map(_.getLong(3)).min)
    }
  }

  test("rrfFuse matches an independent JVM replay; agreement outranks one high rank") {
    // two runs over one query: doc 7 is rank 3 in BOTH systems; doc 1
    // is rank 1 lexically only. RRF: 2/(63) > 1/(61) — agreement wins
    val lex = Seq((100L, 1, 1L), (100L, 2, 5L), (100L, 3, 7L))
      .toDF("query_id", "rank", "id")
    val den = Seq((100L, 1, 9L), (100L, 2, 4L), (100L, 3, 7L))
      .toDF("query_id", "rank", "id")
    val out = Retrieval.rrfFuse(Seq(lex, den), k = 10)
      .orderBy(col("rank")).collect()
    def c(rank: Int): Long = 1000000000L / (60L + rank)
    // JVM replay of every fused score
    val want = Map(1L -> c(1), 5L -> c(2), 7L -> (c(3) + c(3)),
      9L -> c(1), 4L -> c(2))
    out.foreach { r =>
      assert(r.getLong(3) === want(r.getLong(2)),
        s"id ${r.getLong(2)} score mismatch")
    }
    assert(out.head.getLong(2) === 7L, "doc ranked by both systems must fuse first")
    assert(out.head.getLong(4) === 2L, "n_runs must report the agreement")
    // ties (ids 1 and 9 both contribute c(1)) break on ascending id
    val tied = out.filter(r => r.getLong(3) === c(1)).map(_.getLong(2))
    assert(tied.toSeq === Seq(1L, 9L))
  }

  test("persisted-index probe is row-for-row identical to the inline path") {
    val docs = docsDf
    val probes = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"),
        slice(graft.operators.TextAnalysis.cleanTokens(col("text")), 1, 5)
          .as("qterms"))
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    val prefix = Retrieval.bm25IndexCached(docs, "doc_id", "text")
    val fromIdx = Retrieval.bm25TopKFromIndex(spark, prefix,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(direct.nonEmpty && direct.sameElements(fromIdx),
      "index probe diverged from the inline path")
    // second cached call must be a no-op build (same prefix back)
    assert(Retrieval.bm25IndexCached(docs, "doc_id", "text") === prefix)
    // malformed index fails loudly, never scores garbage
    spark.sql(s"DROP TABLE IF EXISTS `${prefix}_stats`")
    spark.range(2).selectExpr("id AS n_docs", "id AS total_tokens")
      .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
    assert(intercept[IllegalArgumentException] {
      Retrieval.bm25TopKFromIndex(spark, prefix, probes, "query_id", "qterms", 10)
    }.getMessage.contains("stats"))
    spark.sql(s"DROP TABLE IF EXISTS `${prefix}_stats`")
  }

  test("big-panel sort-merge probe is row-for-row identical to the inline path") {
    val docs = docsDf
    // a DENSE panel — the shape this entry point exists for
    val probes = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("query_id"),
        slice(graft.operators.TextAnalysis.cleanTokens(col("text")), 1, 5)
          .as("qterms"))
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text",
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    val prefix = Retrieval.bm25IndexCached(docs, "doc_id", "text")
    val big = Retrieval.bm25TopKFromIndexBigPanel(spark, prefix,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(direct.nonEmpty && direct.sameElements(big),
      "big-panel probe diverged from the inline path")
  }

  test("append(delta) onto build(base), then compaction, equals build(full)") {
    val docs = docsDf
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    val probes = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("query_id"),
        slice(graft.operators.TextAnalysis.cleanTokens(col("text")), 1, 5)
          .as("qterms"))
    val fullPrefix = Retrieval.bm25IndexCached(docs, "doc_id", "text")
    val merged = Retrieval.bm25AppendCached(base, delta, "doc_id", "text")
    // the SEGMENTED probe answers bit-identically to the full-built
    // index — per-doc facts and exact sums are layout-invariant
    val fromFull = Retrieval.bm25TopKFromIndex(spark, fullPrefix,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    val fromSeg = Retrieval.bm25TopKFromIndex(spark, merged,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(fromFull.nonEmpty && fromFull.sameElements(fromSeg),
      "segmented probe diverged from the full-built index")
    // the append itself wrote only DELTA-sized tables (the O(delta)
    // claim): the new segment's postings cover only delta docs
    val segIds = spark.table(s"${merged}_postings")
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(segIds.nonEmpty && segIds.forall(_ % 3 == 0),
      "append wrote base rows — it must write the delta segment only")
    // compaction folds segments into ONE layout, table-for-table
    // equal to the full rebuild
    val compacted = Retrieval.bm25CompactCached(spark, merged)
    def rows(table: String, order: Seq[String]) =
      spark.table(table).orderBy(order.map(col): _*).collect().toSeq
    assert(rows(s"${compacted}_postings", Seq("token", "doc_id")) ===
      rows(s"${fullPrefix}_postings", Seq("token", "doc_id")),
      "compacted postings diverge from the full rebuild")
    assert(rows(s"${compacted}_termstats", Seq("token")) ===
      rows(s"${fullPrefix}_termstats", Seq("token")),
      "compacted termstats diverge from the full rebuild")
    // the OR-folded id digest equals the digest built over all ids —
    // per-id bit positions are deterministic, so OR commutes
    assert(rows(s"${compacted}_iddigest", Seq("idx")) ===
      rows(s"${fullPrefix}_iddigest", Seq("idx")),
      "OR-folded digest diverges from the full-built digest")
    val ms = spark.table(s"${compacted}_stats").head()
    val fs = spark.table(s"${fullPrefix}_stats").head()
    assert(ms.getAs[Long]("n_docs") === fs.getAs[Long]("n_docs") &&
      ms.getAs[Long]("total_tokens") === fs.getAs[Long]("total_tokens"))
    // lineage records the fold and the compaction
    assert(ms.getAs[String]("lineage").contains("+compact"),
      s"lineage missing records: ${ms.getAs[String]("lineage")}")
    // and the compacted probe still answers identically
    val fromCompact = Retrieval.bm25TopKFromIndex(spark, compacted,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(fromFull.sameElements(fromCompact),
      "compacted probe diverged")
    // second cached calls serve, never re-merge (same prefixes back)
    assert(Retrieval.bm25AppendCached(base, delta, "doc_id", "text") === merged)
    assert(Retrieval.bm25CompactCached(spark, merged) === compacted)
    // re-submitting ALREADY-INDEXED docs as a delta fails loudly —
    // a silent double-count is the one corruption the merge math
    // cannot detect downstream (the digest flags them, the exact
    // confirm convicts them)
    val e = intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(spark, merged,
        delta.limit(5), "doc_id", "text", s"${merged}_oops")
    }
    assert(e.getMessage.contains("re-submits"), e.getMessage)
    // and appending in place is refused outright
    assert(intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(spark, merged, delta, "doc_id", "text", merged)
    }.getMessage.contains("NEW index prefix"))
    // an EMPTY delta is a named failure, not an opaque bloom-build
    // error (nor a NULL total_tokens in the merged stats)
    assert(intercept[IllegalArgumentException] {
      Retrieval.appendToBm25Index(spark, merged,
        delta.filter(col("doc_id") < 0), "doc_id", "text", s"${merged}_e")
    }.getMessage.contains("delta is empty"))
    // the big-panel sort-merge path refuses a segmented index loudly
    // (its zero-Exchange meet needs the single bucketed layout) and
    // serves the compacted one
    assert(intercept[IllegalArgumentException] {
      Retrieval.bm25TopKFromIndexBigPanel(spark, merged,
        probes, "query_id", "qterms", k = 10)
    }.getMessage.contains("compact"))
    val bigFromCompact = Retrieval.bm25TopKFromIndexBigPanel(spark, compacted,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(fromFull.sameElements(bigFromCompact))
  }

  test("union of same-bucketed tables: aggregates on the bucket key stay exact") {
    // pins the planner hazard the segment merges guard against: a
    // Union of two scans bucketed on the same key satisfies the
    // aggregate's distribution requirement WITHOUT an Exchange, but
    // union concatenates partitions, so key k lives in two of them —
    // an unbarriered agg returns per-table partial rows. The segment
    // merge paths repartition() first; this test fails if that
    // barrier is ever dropped.
    import graft.operators.Bucketing
    val a = (1L to 100L).map(i => (s"k${i % 10}", 1L)).toDF("key", "v")
    val b = (1L to 50L).map(i => (s"k${i % 10}", 10L)).toDF("key", "v")
    Bucketing.writeBucketed(a, "ubt_a", "key", 8, Seq("key"))
    Bucketing.writeBucketed(b, "ubt_b", "key", 8, Seq("key"))
    val u = spark.table("ubt_a").unionByName(spark.table("ubt_b"))
    val merged = u.repartition(col("key"))
      .groupBy(col("key")).agg(sum(col("v")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged.size === 10, s"barriered agg returned ${merged.size} rows")
    assert(merged("k1") === 10L + 50L)
    // document the hazard itself: the UNBARRIERED agg over this union
    // may split groups (observed on the current planner); if a Spark
    // upgrade fixes it, both branches of this assert stay valid
    // because the barriered result above is the contract
    val raw = u.groupBy(col("key")).agg(sum(col("v")).as("v")).count()
    assert(raw >= 10, "aggregate lost groups outright")
  }

  test("champion index: huge c is lossless, small c prunes exactly by impact") {
    val docs = docsDf.limit(150).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"),
        slice(graft.operators.TextAnalysis.cleanTokens(col("text")), 1, 5)
          .as("qterms"))
    val base = Retrieval.bm25IndexCached(docs, "doc_id", "text")
    // c >= any df: pruning keeps everything -> bit-identical probe
    val lossless = Retrieval.bm25ChampionCached(spark, base, c = 1 << 20)
    val exact = Retrieval.bm25TopKFromIndex(spark, base, probes,
        "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    val fromLossless = Retrieval.bm25TopKFromIndex(spark, lossless, probes,
        "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(exact.nonEmpty && exact.sameElements(fromLossless),
      "champion index with c >= max df must reproduce the exact probe")
    // small c: the champion postings are EXACTLY the per-token
    // impact-top rows of the base postings (JVM replay of the window)
    val c = 2
    val champ = Retrieval.bm25ChampionCached(spark, base, c = c)
    val basePostings = spark.table(s"${base}_postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = basePostings.groupBy(_._1).values.flatMap { g =>
      g.sortBy { case (_, docId, tf, dl) => (-(tf * 1000000L / dl), docId) }
        .take(c)
    }.toSet
    val got = spark.table(s"${champ}_postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want, "champion postings diverge from the impact window replay")
    // df and corpus stats are untouched by pruning
    assert(spark.table(s"${champ}_termstats").collect().toSet ===
      spark.table(s"${base}_termstats").collect().toSet)
    assert(spark.table(s"${champ}_stats").select("n_docs", "total_tokens")
      .head() === spark.table(s"${base}_stats")
      .select("n_docs", "total_tokens").head())
    // recall card sanity: matched pairs can never exceed the truth panel
    val truth = Retrieval.bm25TopKFromIndex(spark, base, probes,
      "query_id", "qterms", k = 10)
      .select(col("query_id"), col("doc_id").as("nn_id"))
    val approx = Retrieval.bm25TopKFromIndex(spark, champ, probes,
      "query_id", "qterms", k = 10)
      .select(col("query_id"), col("doc_id").as("nn_id"))
    val rep = graft.operators.Similarity.recallReport(truth, approx).head()
    assert(rep.getLong(1) <= rep.getLong(0))
    assert(rep.getLong(2) >= 0L && rep.getLong(2) <= 1000000L)
    // cached: second call serves the same prefix without a rebuild
    assert(Retrieval.bm25ChampionCached(spark, base, c = c) === champ)
  }

  test("champion index serves the big-panel sort-merge path") {
    // the champion prefix is a single bucketed layout (segments ==
    // itself), so the zero-index-Exchange big-panel probe composes
    // with it — the shape of a 100 TB decontamination sweep with BOTH
    // r10 levers: panel shuffles by token, per-term work capped at c
    val docs = docsDf.limit(200).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("query_id"),
        slice(graft.operators.TextAnalysis.cleanTokens(col("text")), 1, 5)
          .as("qterms"))
    val base = Retrieval.bm25IndexCached(docs, "doc_id", "text")
    val champ = Retrieval.bm25ChampionCached(spark, base, c = 1 << 20)
    val broadcastPath = Retrieval.bm25TopKFromIndex(spark, champ, probes,
        "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    val bigPanelPath = Retrieval.bm25TopKFromIndexBigPanel(spark, champ,
        probes, "query_id", "qterms", k = 10)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(broadcastPath.nonEmpty && broadcastPath.sameElements(bigPanelPath),
      "big-panel probe of the champion index diverged from the broadcast gate")
  }

  test("rrfFuse cut is exact: k bounds each query independently") {
    val run = Seq.tabulate(30)(i => (i % 3).toLong -> (i + 1))
      .zipWithIndex.map { case ((q, r), i) => (q, r, (100 + i).toLong) }
      .toDF("query_id", "rank", "id")
    val out = Retrieval.rrfFuse(Seq(run), k = 4).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach(g => assert(g.length === 4))
    byQ.values.foreach(g =>
      assert(g.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4)))
  }
}
