package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("single-bucket packing fills sequences in doc order, straddling boundaries") {
    val docs = Seq(
      (1L, "w w w"),     // 3 tokens -> seq 0, offset 0
      (2L, "w w w"),     // 3 tokens -> seq 0, offset 3
      (3L, "w w"),       // 2 tokens -> starts at cum 6 -> seq 1, offset 1
      (4L, "w w w w")    // 4 tokens -> starts at cum 8 -> seq 1, offset 3
    ).toDF("doc_id", "text")
    val r = Packing.sequencePack(docs, "doc_id", "text",
        budgetTokens = 5, buckets = 1)
      .select("doc_id", "n_tokens", "seq_in_bucket", "tok_offset")
      .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 3L, 0L, 0L)))
    assert(r(2L) === ((2L, 3L, 0L, 3L)))
    assert(r(3L) === ((3L, 2L, 1L, 1L)))
    assert(r(4L) === ((4L, 4L, 1L, 3L)))
  }

  test("packing is deterministic under repartitioning and covers every doc") {
    val docs = (1L to 500L).map(i => (i, ("tok " * (i % 37 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val a = Packing.sequencePack(docs, "doc_id", "text", 128, buckets = 8)
    val b = Packing.sequencePack(docs.repartition(13), "doc_id", "text",
      128, buckets = 8)
    assert(a.count() === 500L)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "slot assignment must not depend on physical partitioning")
    // offsets always inside the sequence budget
    assert(a.filter("tok_offset < 0 OR tok_offset >= 128").count() === 0)
  }

  test("span corruption: engine spans equal a plain-Scala replica of " +
      "the md5 draw + island merge; spans disjoint and in range") {
    def draw(id: Long, pos: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$pos".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(8), 16) % 1000000L
    }
    def expectedSpans(id: Long, n: Int, ppm: Long): Seq[(Long, Long, Long)] = {
      val sel = (0 until n).filter(p => draw(id, p) < ppm)
      val spans = sel.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      spans.zipWithIndex.map { case ((s, e), i) =>
        ((i + 1).toLong, s.toLong, (e - s + 1).toLong) }
    }
    val n1 = 60; val n2 = 45
    val docs = Seq(
      (7L, Seq.fill(n1)("w").mkString(" ")),
      (9L, Seq.fill(n2)("w").mkString(" "))).toDF("doc_id", "text")
    // high rate so the fixture exercises multi-token islands
    val got = Packing.spanCorruptionPlan(docs, "doc_id", "text",
        maskPpm = 400000L)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }
    assert(got(7L) === expectedSpans(7L, n1, 400000L))
    assert(got(9L) === expectedSpans(9L, n2, 400000L))
    got.foreach { case (id, spans) =>
      val bound = if (id == 7L) n1 else n2
      spans.foreach { case (_, s, l) =>
        assert(s >= 0 && s + l <= bound) }
      // disjoint AND non-adjacent (adjacent picks merged into one span)
      spans.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, _)) => assert(s2 > s1 + l1)
        case _ =>
      }
    }
    val again = Packing.spanCorruptionPlan(docs.repartition(5), "doc_id",
        "text", maskPpm = 400000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === Packing.spanCorruptionPlan(docs, "doc_id", "text",
      maskPpm = 400000L).as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("stride chunks overlap by window - stride and cover every token") {
    // 10 tokens, window 4, stride 2 -> starts 0,2,4,6: every token covered,
    // the last window ends exactly at n (no redundant tail chunk)
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val ch = Packing.strideChunks(docs, "doc_id", "text", window = 4, stride = 2)
      .select("chunk_idx", "n_tokens").as[(Int, Long)].collect().sorted
    assert(ch === Array((0, 4L), (1, 4L), (2, 4L), (3, 4L)))
    // 9 tokens -> starts 0,2,4,6; final chunk truncated to 3 tokens
    val ch9 = Packing.strideChunks(
        Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text"),
        "doc_id", "text", window = 4, stride = 2)
      .select("chunk_idx", "n_tokens").as[(Int, Long)].collect().sorted
    assert(ch9 === Array((0, 4L), (1, 4L), (2, 4L), (3, 3L)))
    // short doc: one truncated chunk
    val short = Packing.strideChunks(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 64, 32)
    assert(short.select("n_tokens").as[Long].collect().toSeq === Seq(2L))
    // chunk fingerprints are content-derived: identical windows hash equal
    val twin = Packing.strideChunks(
      Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", 8, 4)
    assert(twin.select("chunk_md5").distinct().count() === 1)
    assertThrows[IllegalArgumentException] {
      Packing.strideChunks(docs, "doc_id", "text", window = 4, stride = 5)
    }
  }

  test("fim split: spans partition the text, pass-through keeps the raw hash") {
    val docs = (1L to 40L).map(i => (i, s"doc number $i body " * 3))
      .toDF("doc_id", "text")
    val got = Packing.fimSplit(docs, "doc_id", "text")
      .as[(Long, Boolean, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long], String)].collect()
    assert(got.length === 40)
    val lens = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.length.toLong }.toMap
    got.foreach { case (id, applied, st, en, np, nm, ns, h) =>
      if (applied) {
        // spans partition [0, n]: 0 <= start <= end <= n, lengths add up
        assert(st.get >= 0 && st.get <= en.get && en.get <= lens(id))
        assert(np.get + nm.get + ns.get === lens(id))
        assert(np.get === st.get && nm.get === en.get - st.get)
      } else {
        assert(st.isEmpty && en.isEmpty && np.isEmpty)
        // pass-through rows fingerprint the untransformed text
        val raw = java.security.MessageDigest.getInstance("MD5")
          .digest(s"doc number $id body " * 3 getBytes "UTF-8")
          .map("%02x".format(_)).mkString
        assert(h === raw)
      }
    }
    // the joint FIM+AR recipe transforms SOME but not ALL docs
    assert(got.exists(_._2) && got.exists(!_._2))
    // deterministic on any partitioning (md5-derived offsets, no RNG)
    val again = Packing.fimSplit(docs.repartition(7), "doc_id", "text")
      .as[(Long, Boolean, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long], String)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("best-fit-decreasing respects capacity, covers every doc, isolates " +
      "oversized docs, and beats the trivial one-doc-per-bin floor") {
    val docs = (1L to 400L)
      .map(i => (i, ("tok " * (i % 61 + 1).toInt).trim)) :+
      (999L, ("tok " * 80).trim) // oversized vs budget 64
    val df = docs.toDF("doc_id", "text")
    val r = Packing.bestFitPack(df, "doc_id", "text",
        budgetTokens = 64, buckets = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(r.length === 401) // every doc packed exactly once
    assert(r.map(_._1).distinct.length === 401)
    // per-(bucket, bin) fill never exceeds the budget, except a bin
    // holding a single oversized doc
    val byBin = r.groupBy(x => (x._2, x._4))
    byBin.values.foreach { ds =>
      val fill = ds.map(_._3).sum
      assert(fill <= 64 || (ds.length == 1 && ds.head._3 > 64),
        s"overfull bin: $ds")
    }
    // BFD must do strictly better than one bin per doc, and cannot beat
    // the volume lower bound ceil(bucket_tokens / budget)
    val nBins = byBin.size
    assert(nBins < 401)
    val lowerBound = r.groupBy(_._2).values
      .map(ds => (ds.map(_._3).sum + 63) / 64).sum
    assert(nBins >= lowerBound)
  }

  test("best-fit packing streams buckets far larger than the bin count " +
      "(task memory = open bins, not docs) and accepts any bucket count") {
    // 1e5 docs into 4 buckets: ~25k docs per bucket flow through ONE
    // streaming scan whose state is the open-bin capacity list — the
    // round-6 groupByKey+toArray shape would have held the whole bucket
    // per task. Small budget keeps bins plentiful but still << docs.
    val docs = (1L to 100000L).map(i => (i, ("t " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val r = Packing.bestFitPack(docs, "doc_id", "text",
      budgetTokens = 8, buckets = 4)
    assert(r.count() === 100000L)
    // capacity invariant holds on the full output
    assert(r.groupBy("bucket", "bin_in_bucket")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("fill"))
      .filter("fill > 8").count() === 0)
    // the old 256-bucket cap is gone: parallelism scales with the corpus
    val wide = Packing.bestFitPack(
      (1L to 50L).map(i => (i, "t t t")).toDF("doc_id", "text"),
      "doc_id", "text", budgetTokens = 8, buckets = 1000)
    assert(wide.count() === 50L)
    assert(wide.filter("bucket < 0 OR bucket >= 1000").count() === 0)
  }

  test("best-fit packing is deterministic under repartitioning") {
    val docs = (1L to 300L).map(i => (i, ("tok " * (i % 53 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val a = Packing.bestFitPack(docs, "doc_id", "text", 128, buckets = 8)
    val b = Packing.bestFitPack(docs.repartition(13), "doc_id", "text",
      128, buckets = 8)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
      "bin assignment must not depend on physical partitioning")
  }
}
