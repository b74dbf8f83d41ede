package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.layers.{Bronze, Gold, Silver}

/** Property-based invariants (the testing technique the reference lacks —
  * SURVEY §5 lists these as our additions): normalization idempotence,
  * count conservation, sketch determinism. Plain ScalaCheck generators
  * with fixed seeds drive several sampled cases per property.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private val word = Gen.alphaLowerStr.map(s => if (s.isEmpty) "w" else s.take(8))
  private val text = Gen.listOfN(12, word).map(_.mkString(" "))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("silver normalization is idempotent (clean ∘ clean = clean)") {
    samples(Gen.listOfN(5, text), 5).foreach { texts =>
      val d = java.time.LocalDate.of(2024, 1, 15)
      val records = texts.zipWithIndex.map { case (t, i) =>
        s"""{"id": "p-$i", "name": "  $t  ", "brewery_type": "MiCrO", "city": "c",
            "state_province": "sp", "country": "ct", "phone": "($i) 5-5",
            "longitude": "1.0", "latitude": "2.0", "postal_code": "1", "website_url": "w"}"""
      }
      val once = Silver.transform(Bronze.build(spark, records, d), d)
      val twice = Silver.clean(once)
      assert(once.collect().map(_.toString).sorted.toSeq ==
        twice.collect().map(_.toString).sorted.toSeq)
    }
  }

  test("conservation: sum(gold.brewery_count) == silver row count") {
    samples(Gen.chooseNum(1, 30), 5).foreach { n =>
      val d = java.time.LocalDate.of(2024, 1, 15)
      val records = (0 until n).map { i =>
        s"""{"id": "c-$i", "name": "B$i", "brewery_type": "t${i % 3}", "city": "c${i % 2}",
            "state_province": "s", "country": "x", "phone": "1",
            "longitude": "0", "latitude": "0", "postal_code": "1", "website_url": "w"}"""
      }
      val silver = Silver.transform(Bronze.build(spark, records, d), d)
      val gold = Gold.aggregate(silver, d)
      assert(Gold.total(gold) == n.toLong)
    }
  }

  test("fingerprint and simhash are pure functions of the text") {
    samples(Gen.listOfN(4, text), 3).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val a = ops.TextAnalysis.fingerprints(df).collect().map(_.getLong(1)).toSeq
      val b = ops.TextAnalysis.fingerprints(df).collect().map(_.getLong(1)).toSeq
      assert(a == b)
      val s1 = ops.Dedup.simhashes(df, "doc_id", "text")
        .orderBy("sh_id").collect().map(_.getLong(1)).toSeq
      val s2 = ops.Dedup.simhashes(df, "doc_id", "text")
        .orderBy("sh_id").collect().map(_.getLong(1)).toSeq
      assert(s1 == s2)
    }
  }

  test("minhash_array is mergeable: sig(a ++ b) = pointwise min of sigs") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchArrayExpressions._
    val hashes = Gen.listOfN(10, Gen.chooseNum(0L, 1L << 40))
    samples(Gen.zip(hashes, hashes), 5).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val row = df.select(
        minhashArray(col("a"), 8).alias("sa"),
        minhashArray(col("b"), 8).alias("sb"),
        minhashArray(concat(col("a"), col("b")), 8).alias("sab")).collect().head
      val sa = row.getSeq[Long](0); val sb = row.getSeq[Long](1)
      val sab = row.getSeq[Long](2)
      assert(sab == sa.zip(sb).map { case (x, y) => math.min(x, y) },
        "signature of a union must be the pointwise min (mergeability)")
    }
  }

  test("sketches are input-order invariant (set semantics)") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchArrayExpressions._
    val hashes = Gen.listOfN(12, Gen.chooseNum(-(1L << 40), 1L << 40))
    samples(hashes, 5).foreach { h =>
      val df = Seq((h, scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(h))).toDF("a", "b")
      val row = df.select(
        minhashArray(col("a"), 8).alias("sa"), minhashArray(col("b"), 8).alias("sb"),
        simhashArray(col("a")).alias("ha"), simhashArray(col("b")).alias("hb"))
        .collect().head
      assert(row.getSeq[Long](0) == row.getSeq[Long](1))
      assert(row.getLong(2) == row.getLong(3))
    }
  }

  test("feature_hash is linear: fh(a ++ b) = fh(a) + fh(b) pointwise") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchArrayExpressions._
    val hashes = Gen.listOfN(15, Gen.chooseNum(-(1L << 40), 1L << 40))
    samples(Gen.zip(hashes, hashes), 5).foreach { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b").select(
        featureHash(col("a"), 16).alias("fa"),
        featureHash(col("b"), 16).alias("fb"),
        featureHash(concat(col("a"), col("b")), 16).alias("fab")).collect().head
      val fa = row.getSeq[Float](0); val fb = row.getSeq[Float](1)
      assert(row.getSeq[Float](2) == fa.zip(fb).map { case (x, y) => x + y },
        "bucket counts must add under concatenation (mergeable embeddings)")
    }
  }

  test("shingle_windows emits exactly max(0, n-k+1) windows") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchArrayExpressions._
    samples(Gen.chooseNum(0, 9), 6).foreach { n =>
      val arr = (0 until n).map(_.toLong)
      val out = Seq(Tuple1(arr)).toDF("a")
        .select(shingleWindows(col("a"), 3).alias("w"))
        .collect().head.getSeq[Long](0)
      assert(out.length == math.max(0, n - 2))
    }
  }

  test("sketch operators tolerate degenerate docs (empty / single-token)") {
    val df = Seq((1L, ""), (2L, "one"), (3L, "two words here ok")).toDF("doc_id", "text")
    val sigs = ops.Dedup.minhashSignatures(df, "doc_id", "text", k = 3, numHashes = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L))
    assert(sigs(1L).forall(_ == 2147483647L)) // sentinel for shingle-less docs
    assert(sigs(3L).exists(_ != 2147483647L)) // 4 tokens, k=3 -> 2 shingles
    val sims = ops.Dedup.simhashes(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == 0L) // empty doc hashes to 0
  }

  test("hammingPairs blocking is complete: equals all-pairs for any maxHamming") {
    val genHashes = Gen.listOfN(40, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    samples(genHashes, 3).foreach { hs0 =>
      // salt in near-dups: flip a few bits of some hashes
      val hs = (hs0 ++ hs0.take(8).map(_ ^ 0x11L) ++ hs0.take(4).map(_ ^ (1L << 63)))
        .distinct.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val df = hs.toDF("id", "h")
      for (maxH <- Seq(1, 3, 6)) {
        val got = ops.Dedup.hammingPairs(df, "id", "h", maxH)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = (for {
          (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
          d = java.lang.Long.bitCount(ha ^ hb) if d <= maxH
        } yield (ia, ib, d.toLong)).toSet
        assert(got == want, s"maxHamming=$maxH")
      }
    }
  }

  test("editDistanceDups is exact within blocks: equals brute force " +
    "restricted to same (prefix, length-bucket) for random edits") {
    val base = samples(Gen.listOfN(10, word).map(_.mkString(" ")), 8)
    // derive near-dups by random in-place edits PAST the prefix so they
    // stay in-block; add unrelated docs as negatives
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      val padded = t.padTo(40, 'x')
      val edited = padded.updated(30, 'Z').updated(35, 'Q')
      Seq((i * 10L, padded), (i * 10L + 1L, edited))
    }
    val df = docs.toDF("doc_id", "text")
    val got = graft.ops.Dedup.editDistanceDups(df, "doc_id", "text", maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force reference with the same block rule
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib
      if ta.take(24) == tb.take(24) && ta.length / 16 == tb.length / 16
      d = lev(ta, tb) if d <= 8
    } yield (ia, ib) -> d.toLong).toMap
    assert(got == expect, s"blocked result diverged from in-block brute force")
    // and every constructed edit pair was in-block, so none were lost
    assert(base.indices.forall(i => got.contains((i * 10L, i * 10L + 1L))))
  }

  test("negativeSamples counts: min(k, group-1) negatives each, " +
    "uniform-ish ring usage") {
    val n = 40
    val df = (1L to n.toLong).map(i => (i, "g")).toDF("doc_id", "lang")
    for (k <- Seq(1, 3, 7)) {
      val out = graft.ops.TrainPrep.negativeSamples(df, "doc_id", "lang", k)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(out.length == n * math.min(k, n - 1))
      assert(out.forall { case (a, b) => a != b })
      // every doc is sampled AS a negative by someone (ring coverage):
      // each doc is the i-th successor of exactly one doc for each i<=k
      val asNegative = out.groupBy(_._2).view.mapValues(_.size).toMap
      assert(asNegative.values.forall(_ == math.min(k, n - 1)),
        s"ring usage skewed: ${asNegative.values.toSeq.distinct}")
    }
  }

  test("scd2 merge equals the sequential replay reference on random updates") {
    // reference: replay updates per key in (ts, tie) order against a plain
    // in-memory state machine; scd2Merge must produce the same versions
    val genUpd = Gen.listOfN(30, for {
      key <- Gen.chooseNum(1L, 4L)
      st <- Gen.oneOf("A", "B", "C")
      ts <- Gen.chooseNum(1L, 20L)
    } yield (key, st, ts))
    samples(genUpd, 4).foreach { upds0 =>
      val upds = upds0.zipWithIndex.map { case ((k, st, ts), i) => (k, st, ts, i.toLong) }
      val history = Seq((1L, "Z", 0L, Option.empty[Long], true))
        .toDF("key", "state", "valid_from", "valid_to", "is_current")
      val got = ops.Relational
        .scd2Merge(history, upds.toDF("key", "state", "ts", "tie"),
          "key", Seq("state"), "ts", "tie")
        .collect().map(r => (r.getAs[Long]("key"), r.getAs[String]("state"),
          r.getAs[Long]("valid_from"),
          Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]))).toSet
      // replay reference
      val want = scala.collection.mutable.Set.empty[(Long, String, Long, Option[Long])]
      val byKey = (upds.map(u => (u._1, u._2, u._3, u._4)) ++ Seq((1L, "Z", 0L, -1L)))
        .groupBy(_._1)
      byKey.foreach { case (k, us) =>
        val ordered = us.sortBy(u => (u._3, u._4))
        var cur: (String, Long) = null
        ordered.foreach { case (_, st, ts, _) =>
          if (cur == null) cur = (st, ts)
          else if (cur._1 != st) { want += ((k, cur._1, cur._2, Some(ts))); cur = (st, ts) }
        }
        want += ((k, cur._1, cur._2, None))
      }
      assert(got == want.toSet, s"scd2 mismatch for ${upds.take(5)}…")
    }
  }

  test("incremental refresh equals full recompute on random changelogs") {
    val genRows = Gen.listOfN(40, for {
      g <- Gen.oneOf("x", "y", "z")
      v <- Gen.chooseNum(1L, 100L)
    } yield (g, v))
    samples(genRows, 4).foreach { rows =>
      val (base0, inserts) = rows.splitAt(25)
      // delete a deterministic subset of the base
      val deletes = base0.filter(_._2 % 3 == 0)
      val base = base0.toDF("g", "v")
      val prev = ops.Incremental.aggregate(base, Seq("g"), Seq("v"))
      val changes = inserts.map { case (g, v) => (g, v, "insert") }
        .++(deletes.map { case (g, v) => (g, v, "delete") })
        .toDF("g", "v", "_change")
      val got = ops.Incremental.refreshAgg(prev, changes, Seq("g"), Seq("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // full recompute over (base minus one occurrence per delete) + inserts
      val finalRows = deletes.foldLeft(base0) { (acc, d) =>
        val i = acc.indexOf(d); acc.patch(i, Nil, 1)
      } ++ inserts
      val want = finalRows.groupBy(_._1).map { case (g, vs) =>
        (g, vs.size.toLong, vs.map(_._2).sum) }.filter(_._2 > 0).toSet
      assert(got == want, s"incremental mismatch")
    }
  }

  test("minhashPairsAgainst completeness: equals the full LSH filtered to " +
    "pairs touching a batch doc, for any corpus split") {
    // the daily pair-generation law the incremental corpus pipeline rides
    // on: probing batch band keys against stored+batch signatures finds
    // EXACTLY the full self-join's pairs with >= 1 batch end
    val docG = for {
      base <- Gen.chooseNum(0, 5)
      tail <- word
    } yield (0 until 6).map(j => s"t${base}x$j").mkString(" ") + " " + tail
    samples(Gen.listOfN(14, docG), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sigs = ops.Dedup.minhashSignatures(docs, "doc_id", "text",
        k = 2, numHashes = 16).localCheckpoint(false)
      val full = ops.Dedup.minhashLshFromSigs(sigs, numHashes = 16,
          bands = 4, minJaccard = 0.3)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batchIds = (0L until 14L).filter(_ % 3 == 0).toSet
      val batchSigs = sigs.filter(col("mh_id").isInCollection(batchIds))
      val got = ops.Dedup.minhashPairsAgainst(batchSigs, sigs,
          numHashes = 16, bands = 4, minJaccard = 0.3)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = full.filter { case (a, b) =>
        batchIds.contains(a) || batchIds.contains(b) }
      assert(got == want, s"batch probe != filtered full join: $got vs $want")
    }
  }

  test("exciseDuplicateSpans conservation: kept + removed = original, and " +
    "every duplicated window loses all but its first occurrence") {
    val docG = Gen.listOfN(8, Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" "))
    samples(Gen.listOfN(6, docG), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 2
      val out = ops.Dedup.exciseDuplicateSpans(docs, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3)))
      out.foreach { case (_, n, rm, txt) =>
        val kept = if (txt.isEmpty) 0 else txt.split(" ").length
        assert(kept + rm == n, s"token conservation violated: $n $rm '$txt'")
      }
      // windows that occur once corpus-wide are never touched: a doc with
      // entirely unique windows survives verbatim
      val windows = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split(" ").sliding(k).map(w => w.mkString(" ") -> i) }
      val dupWins = windows.groupBy(_._1).filter(_._2.size > 1).keySet
      texts.zipWithIndex.foreach { case (t, i) =>
        val mine = t.split(" ").sliding(k).map(_.mkString(" ")).toSeq
        if (mine.forall(w => !dupWins.contains(w))) {
          val row = out.find(_._1 == i.toLong).get
          assert(row._4 == t, s"doc with unique windows must be untouched")
        }
      }
    }
  }

  test("exciseDuplicateSpans on a dense long doc: two-pointer rewrite " +
    "matches a reference interval-cover computation") {
    // a book-length doc built from a tiny vocabulary: nearly every window
    // is duplicated, so the cut list is dense — the shape where the old
    // O(len × cuts) HOF rewrite went quadratic and the two-pointer merge
    // must stay exact
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val rng = new scala.util.Random(42)
    val longDoc = Seq.fill(3000)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val uniqueDoc = (0 until 50).map(i => s"u$i").mkString(" ")
    val docs = Seq((0L, longDoc), (1L, longDoc), (2L, uniqueDoc))
      .toDF("doc_id", "text")
    val k = 3
    val out = ops.Dedup.exciseDuplicateSpans(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // reference: compute duplicated windows and the covered index set
    // directly (first (doc, pos) occurrence survives, all others cut)
    val toks = Map(0L -> longDoc.split(" "), 1L -> longDoc.split(" "),
      2L -> uniqueDoc.split(" "))
    val occ = for {
      (id, ts) <- toks.toSeq; i <- 0 to ts.length - k
    } yield (ts.slice(i, i + k).mkString(" "), (id, i))
    val first = occ.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val dupWins = occ.groupBy(_._1).filter(_._2.size > 1).keySet
    toks.foreach { case (id, ts) =>
      val cut = (0 to ts.length - k).filter { i =>
        val w = ts.slice(i, i + k).mkString(" ")
        dupWins.contains(w) && first(w) != ((id, i))
      }
      val covered = cut.flatMap(p => p until p + k).toSet
      val expectKept = ts.indices.filterNot(covered)
      val (n, rm, txt) = out(id)
      assert(n == ts.length)
      assert(rm == covered.size, s"doc $id: removed $rm vs ${covered.size}")
      assert(txt == expectKept.map(ts).mkString(" "), s"doc $id text mismatch")
    }
    // conservation still holds on the dense fixture
    out.values.foreach { case (n, rm, txt) =>
      val kept = if (txt.isEmpty) 0 else txt.split(" ").length
      assert(kept + rm == n)
    }
  }

  test("trainQualityWeights invariants: counts total, weights centered in " +
    "(-500000, 500000], flipping all labels negates nothing but the sign") {
    val docG = for { t <- text; y <- Gen.oneOf(0L, 1L) } yield (t, y)
    samples(Gen.listOfN(8, docG), 5).foreach { rows =>
      val labeled = rows.zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
        .toDF("doc_id", "text", "y")
      val w = ops.TextAnalysis.trainQualityWeights(labeled, "text", "y", dim = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(w.length == 16, "one weight per bucket, always")
      val totTokens = rows.map(_._1.split(" ").count(_.nonEmpty)).sum
      assert(w.map(r => r._2 + r._3).sum == totTokens,
        "bucket counts must total the corpus token instances")
      w.foreach { case (_, _, _, wt) =>
        assert(wt > -500000L && wt <= 500000L, s"weight out of range: $wt")
      }
      // label flip swaps pos/neg counts bucket-for-bucket
      val flipped = ops.TextAnalysis.trainQualityWeights(
          labeled.withColumn("y", lit(1L) - col("y")), "text", "y", dim = 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      w.foreach { case (b, p, ng, _) =>
        assert(flipped(b) == ((ng, p)), s"flip must swap counts at bucket $b")
      }
    }
  }

  test("mergeUpsert batch-split equivalence: apply(c1++c2) = apply(apply(c1), c2)") {
    // the CDC-apply law that makes incremental snapshot maintenance safe:
    // folding a changelog in two batches (ordered by seq) must equal one
    // pass over the concatenation
    val keyG = Gen.chooseNum(1L, 8L)
    val opG = Gen.frequency(3 -> Gen.const("upsert"), 1 -> Gen.const("delete"))
    val changeG = for { k <- keyG; v <- word; o <- opG } yield (k, v, o)
    samples(Gen.listOfN(14, changeG), 6).foreach { cs =>
      val base = Seq((1L, "b1"), (2L, "b2"), (9L, "b9")).toDF("k", "v")
      val seqd = cs.zipWithIndex.map { case ((k, v, o), i) => (k, v, i.toLong, o) }
      val (c1, c2) = seqd.splitAt(7)
      def df(rows: Seq[(Long, String, Long, String)]) = rows.toDF("k", "v", "seq", "op")
      val onePass = ops.Relational.mergeUpsert(base, df(seqd), "k", "seq", "op")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val twoPass = ops.Relational.mergeUpsert(
          ops.Relational.mergeUpsert(base, df(c1), "k", "seq", "op"),
          df(c2), "k", "seq", "op")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(onePass == twoPass, s"changelog fold not associative for $seqd")
    }
  }

  test("bpeTrainMerges + segment counts equal an independent fold " +
    "reference on random small-alphabet corpora") {
    // a 3-letter alphabet forces dense pair collisions, ties, l = r runs,
    // and multi-char merges within a few rounds — the shapes where greedy
    // fold semantics and overlap counting can silently diverge
    val wordG = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val docG = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, wordG).map(_.mkString(" ")))
    def refMerge(toks: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var pend: String = null
      toks.foreach { t =>
        if (pend == l && t == r) { out += (l + r); pend = null }
        else { if (pend != null) out += pend; pend = t }
      }
      if (pend != null) out += pend
      out.toList
    }
    samples(Gen.listOfN(6, docG), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 4
      val got = ops.TextAnalysis.bpeTrainMerges(df, "text", numMerges = k)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toList
      // reference: word-frequency state, all-adjacent-pair counting,
      // (count desc, l, r) argmax, greedy-leftmost merge
      var vocab = texts.flatMap(_.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      var state = vocab.keys.map(w => w -> w.map(_.toString).toList).toMap
      val refMerges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      var done = false
      (1 to k).foreach { _ =>
        if (!done) {
          val pc = scala.collection.mutable.Map.empty[(String, String), Long]
          state.foreach { case (w, toks) =>
            toks.zip(toks.drop(1)).foreach { p =>
              pc(p) = pc.getOrElse(p, 0L) + vocab(w)
            }
          }
          if (pc.isEmpty) done = true
          else {
            val ((l, r), c) = pc.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
            refMerges += ((l, r, c))
            state = state.map { case (w, toks) => w -> refMerge(toks, l, r) }
          }
        }
      }
      assert(got == refMerges.toList, s"merge tables differ on corpus $texts")
      val segGot = ops.TextAnalysis.bpeSegmentedTokenCountDict(
          df, "doc_id", "text", refMerges.toList.map(m => (m._1, m._2)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val segRef = texts.zipWithIndex.flatMap { case (t, i) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) None
        else Some(i.toLong -> ws.map(w => state(w).size.toLong).sum)
      }.toMap
      assert(segGot == segRef, s"segment counts differ on corpus $texts")
    }
  }

  test("intRoot is the exact integer t-th root for t in 2..6, including " +
    "perfect powers and their neighbours") {
    // adversarial inputs: n = r^t - 1, r^t, r^t + 1 stress the pow seed's
    // rounding on exactly the values where off-by-one flips the floor
    val rG = Gen.chooseNum(1L, 1000000L)
    val cases = (2 to 6).flatMap { t =>
      val roots = samples(rG, 8).filter(r => BigInt(r).pow(t) < BigInt(2).pow(52))
      roots.flatMap { r =>
        val p = BigInt(r).pow(t).toLong
        Seq(p - 1, p, p + 1).filter(_ >= 1).map(n => (n, t))
      } ++ samples(Gen.chooseNum(1L, 4503599627370496L), 8).map(n => (n, t))
    }
    val df = cases.toDF("n", "t")
    (2 to 6).foreach { t =>
      val got = df.filter(col("t") === t)
        .select(col("n"), ops.TrainPrep.intRoot(col("n"), t).alias("r"))
        .collect()
      got.foreach { row =>
        val n = row.getLong(0); val r = row.getLong(1)
        assert(BigInt(r).pow(t) <= BigInt(n) && BigInt(r + 1).pow(t) > BigInt(n),
          s"intRoot($n, $t) = $r is not the floor root")
      }
    }
  }
}
