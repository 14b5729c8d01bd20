package graft

import graft.functions.{SketchOps, TextFunctions}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** Randomized (fixed-seed, reproducible) property checks for the
  * native kernels — the single-pass JVM loops must agree with their
  * obviously-correct reference formulations on arbitrary inputs, not
  * just the corpus shapes the query gates exercise.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new Random(42)

  private def randWords(n: Int): String =
    Seq.fill(n)(("a" + rnd.nextInt(30)).toString).mkString(" ")

  test("bigram surprisal: collapsed pipeline equals the direct per-doc mirror on duplicate-heavy corpora") {
    import spark.implicits._
    import graft.operators.LangModel
    for (round <- 1 to 3) {
      // heavy duplication ON PURPOSE: 30 docs over 8 unique texts —
      // the regime the collapse-first rewrite exists for; the mirror
      // below is the DIRECT (uncollapsed) formulation
      val uniq = Vector.fill(8)(randWords(2 + rnd.nextInt(10)))
      val docs = (1L to 30L).map(id => (id, uniq(rnd.nextInt(8))))
      val got = LangModel.bigramSurprisal(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val bis = toks.toSeq.flatMap { case (id, t) =>
        t.zip(t.drop(1)).map(p => (id, p)) }
      val c12 = bis.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val c1 = bis.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
      val v = toks.values.flatten.toSet.size.toLong
      val want = bis.groupBy(_._1).map { case (id, bs) =>
        val terms = bs.map { case (_, p) =>
          1000000L * (c1(p._1) + v) / (c12(p) + 1) }
        id -> (bs.size.toLong, terms.sum, terms.sum / bs.size)
      }
      assert(got == want, s"round $round")
    }
  }

  test("kneser-ney: collapsed hashed pipeline equals the direct per-doc mirror on split corpora") {
    import spark.implicits._
    import graft.operators.LangModel
    for (round <- 1 to 3) {
      // duplicate-heavy on purpose; train/score split so the unseen
      // branches (unseen bigram under seen context, unseen context)
      // are all live. Mirror is the direct uncollapsed KN arithmetic.
      val uniq = Vector.fill(10)(randWords(2 + rnd.nextInt(10)))
      val docs = (1L to 40L).map(id => (id, uniq(rnd.nextInt(10))))
      val train = docs.filter(_._1 % 3 != 0)
      val score = docs.filter(_._1 % 3 == 0)
      val got = LangModel.kneserNeySurprisal(
          train.toDF("doc_id", "text"), score.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val trToks = train.map { case (_, t) => t.split(" ").toSeq }
      val bisT = trToks.flatMap(t => t.zip(t.drop(1)))
      val c12 = bisT.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bisT.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n1p = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n1c = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val v = trToks.flatten.toSet.size.toLong
      val b = c12.size.toLong
      val want = score.flatMap { case (id, t) =>
        val toks = t.split(" ").toSeq
        val bs = toks.zip(toks.drop(1))
        if (bs.isEmpty) None
        else {
          val terms = bs.map { p =>
            c1.get(p._1) match {
              case Some(cc1) =>
                1000000L * 4L * cc1 * (b + v) /
                  (math.max(4L * c12.getOrElse(p, 0L) - 3L, 0L) * (b + v) +
                    3L * n1p(p._1) * (n1c.getOrElse(p._2, 0L) + 1L))
              case None =>
                1000000L * (b + v) / (n1c.getOrElse(p._2, 0L) + 1L)
            }
          }
          Some(id -> (bs.size.toLong, terms.sum, terms.sum / bs.size))
        }
      }.toMap
      assert(got == want, s"round $round")
    }
  }

  test("kneser-ney order 3: collapsed hashed pipeline equals the direct per-doc mirror on split corpora") {
    import spark.implicits._
    import graft.operators.LangModel
    for (round <- 1 to 3) {
      // duplicate-heavy, train/score split so all three backoff
      // branches (unseen trigram under seen context, unseen context
      // with seen middle, unseen middle) are live. Mirror is the
      // direct uncollapsed three-level KN arithmetic.
      val uniq = Vector.fill(10)(randWords(3 + rnd.nextInt(10)))
      val docs = (1L to 40L).map(id => (id, uniq(rnd.nextInt(10))))
      val train = docs.filter(_._1 % 3 != 0)
      val score = docs.filter(_._1 % 3 == 0)
      val got = LangModel.kneserNey3Surprisal(
          train.toDF("doc_id", "text"), score.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val trToks = train.map { case (_, t) => t.split(" ").toSeq }
      val trisT = trToks.flatMap(t => t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toSeq)
      val c123 = trisT.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctx = c123.toSeq.groupBy(e => (e._1._1, e._1._2)).view
        .mapValues(es => (es.map(_._2).sum, es.size.toLong)).toMap
      val t23 = c123.keys.groupBy(k => (k._2, k._3)).view
        .mapValues(_.size.toLong).toMap
      val mid = t23.toSeq.groupBy(_._1._1).view
        .mapValues(es => (es.map(_._2).sum, es.size.toLong)).toMap
      val n1c = t23.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val v = trToks.flatten.toSet.size.toLong
      val b2 = t23.size.toLong
      val want = score.flatMap { case (id, t) =>
        val toks = t.split(" ").toSeq
        val ts = toks.lazyZip(toks.drop(1)).lazyZip(toks.drop(2)).toSeq
        if (ts.isEmpty) None
        else {
          val terms = ts.map { case tri @ (w1, w2, w3) =>
            ctx.get((w1, w2)) match {
              case Some((cc, n3p)) =>
                val (tmid, n2p) = mid(w2)
                1000000L * 16L * cc * tmid * (b2 + v) /
                  (math.max(4L * c123.getOrElse(tri, 0L) - 3L, 0L) * 4L * tmid * (b2 + v) +
                    3L * n3p * (math.max(4L * t23.getOrElse((w2, w3), 0L) - 3L, 0L) * (b2 + v) +
                      3L * n2p * (n1c.getOrElse(w3, 0L) + 1L)))
              case None =>
                mid.get(w2) match {
                  case Some((tmid, n2p)) =>
                    1000000L * 4L * tmid * (b2 + v) /
                      (math.max(4L * t23.getOrElse((w2, w3), 0L) - 3L, 0L) * (b2 + v) +
                        3L * n2p * (n1c.getOrElse(w3, 0L) + 1L))
                  case None =>
                    1000000L * (b2 + v) / (n1c.getOrElse(w3, 0L) + 1L)
                }
            }
          }
          Some(id -> (ts.size.toLong, terms.sum, terms.sum / ts.size))
        }
      }.toMap
      assert(got == want, s"round $round")
    }
  }

  test("kneser-ney order 3: each smoothed conditional sums to exactly 1 over the vocabulary") {
    import graft.operators.LangModel
    import spark.implicits._
    // normalization as a RATIONAL identity: for sampled (w1,w2)
    // contexts, Σ_w3∈V P(w3|w1,w2) == 1 exactly — checked in exact
    // BigInt arithmetic over the same derived tables the engine uses.
    val uniq = Vector.fill(6)(randWords(4 + rnd.nextInt(8)))
    val train = (1L to 20L).map(id => (id, uniq(rnd.nextInt(6))))
    val trToks = train.map { case (_, t) => t.split(" ").toSeq }
    val trisT = trToks.flatMap(t => t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toSeq)
    val c123 = trisT.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t23 = c123.keys.groupBy(k => (k._2, k._3)).view.mapValues(_.size.toLong).toMap
    val mid = t23.toSeq.groupBy(_._1._1).view
      .mapValues(es => (es.map(_._2).sum, es.size.toLong)).toMap
    val n1c = t23.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = trToks.flatten.toSet
    val v = vocab.size.toLong
    val b2 = t23.size.toLong
    val ctxs = c123.keys.map(k => (k._1, k._2)).toSeq.distinct.take(5)
    ctxs.foreach { case (w1, w2) =>
      val cOf = c123.collect { case ((a, b, w3), n) if a == w1 && b == w2 => w3 -> n }
      val c12ctx = cOf.values.sum
      val n3p = cOf.size.toLong
      val (tmid, n2p) = mid(w2)
      // P(w3|w1w2) = NUM(w3) / (16·c12ctx·tmid·(b2+v)); sum NUMs
      val total = vocab.toSeq.map { w3 =>
        BigInt(math.max(4L * cOf.getOrElse(w3, 0L) - 3L, 0L)) * 4 * tmid * (b2 + v) +
          BigInt(3) * n3p * (BigInt(math.max(4L * t23.getOrElse((w2, w3), 0L) - 3L, 0L)) * (b2 + v) +
            BigInt(3) * n2p * (n1c.getOrElse(w3, 0L) + 1L))
      }.sum
      assert(total == BigInt(16) * c12ctx * tmid * (b2 + v),
        s"context ($w1,$w2) must normalize exactly")
    }
  }

  test("phrase search equals a naive token-window scan on random corpora") {
    import spark.implicits._
    import graft.operators.Retrieval
    for (round <- 1 to 3) {
      // duplicate-heavy: 20 docs over 8 unique texts, so the
      // collapse-first twin's fan-out path is actually exercised
      val uniq = Vector.fill(8)(randWords(1 + rnd.nextInt(15)))
      val docs = (1L to 20L).map(id => (id, uniq(rnd.nextInt(8))))
      val phrases = (1L to 4L).map(pid => (pid, randWords(1 + rnd.nextInt(3))))
      val got = Retrieval.phraseSearch(
          docs.toDF("doc_id", "text"), "doc_id", "text", phrases)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (id, t) <- docs
        toks = t.split(" ").toSeq
        (pid, p) <- phrases
        ptoks = p.split(" ").toSeq
        n = (0 to toks.size - ptoks.size)
          .count(i => toks.slice(i, i + ptoks.size) == ptoks)
        if n > 0
      } yield (id, pid, n.toLong)).toSet
      assert(got == want, s"round $round")
      val collapsed = Retrieval.phraseSearchCollapsed(
          docs.toDF("doc_id", "text"), "doc_id", "text", phrases)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(collapsed == want, s"collapsed round $round")
    }
  }

  test("sortedIntersectCount equals set intersection on random sorted arrays") {
    for (_ <- 1 to 300) {
      val a = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val got = SketchOps.sortedIntersectCount(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(got == a.toSet.intersect(b.toSet).size.toLong,
        s"a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("shingleHashes count equals distinct shingle-string count") {
    for (_ <- 1 to 200) {
      val text = randWords(rnd.nextInt(30))
      val n = 1 + rnd.nextInt(4)
      val hashes = SketchOps.shingleHashes(UTF8String.fromString(text), n)
      val toks = text.split(" ", -1)
      val want =
        if (toks.length < n) 0
        else toks.sliding(n).map(_.mkString(" ")).toSet.size
      assert(hashes.numElements() == want, s"text='$text' n=$n")
    }
  }

  test("minHashSig slots are monotone under element addition") {
    // adding elements can only LOWER each signature slot (elementwise
    // min) — the property LSH banding correctness rests on
    for (_ <- 1 to 100) {
      val xs = Array.fill(1 + rnd.nextInt(30))(rnd.nextLong())
      val more = xs ++ Array.fill(1 + rnd.nextInt(10))(rnd.nextLong())
      val k = 16
      val s1 = SketchOps.minHashSig(new GenericArrayData(xs), k)
      val s2 = SketchOps.minHashSig(new GenericArrayData(more), k)
      for (i <- 0 until k)
        assert(s2.getLong(i) <= s1.getLong(i))
    }
  }

  test("JPEG synthesize→decode roundtrip and EXIF-strip arithmetic hold for random shapes") {
    import graft.operators.Multimodal
    for (_ <- 1 to 300) {
      val w = 1 + rnd.nextInt(65535)
      val h = 1 + rnd.nextInt(65535)
      val exif = rnd.nextInt(200)
      val entropy = rnd.nextInt(200)
      val jpg = Multimodal.synthesizeJpeg(w, h, exif, entropy)
      assert(jpg.length == 47 + exif + entropy)
      assert(Multimodal.decodeJpeg(jpg).contains((w, h, 3)), s"w=$w h=$h exif=$exif")
      val stripped = Multimodal.stripExif(jpg)
      assert(stripped.length == jpg.length - (10 + exif))
      assert(Multimodal.decodeJpeg(stripped).contains((w, h, 3)))
      // idempotent: nothing left to strip
      assert(Multimodal.stripExif(stripped).sameElements(stripped))
      // truncation anywhere inside the marker stream must yield None,
      // never a crash or a hang (entropy/EOI tail truncation is fine
      // to reject or accept — the walk stops at SOF either way)
      val cut = 2 + rnd.nextInt(math.max(1, jpg.length - entropy - 4))
      Multimodal.decodeJpeg(jpg.take(cut)) // must not throw
      Multimodal.stripExif(jpg.take(cut))  // must not throw
    }
  }

  test("prefix+length-filtered jaccard equals brute force on random corpora") {
    import graft.operators.Dedup
    import spark.implicits._
    for (round <- 1 to 3) {
      val base = Seq.tabulate(30)(i => (i.toLong, randWords(8 + rnd.nextInt(15))))
      // clones with one perturbed token → guaranteed high-jaccard pairs
      val clones = base.take(10).map { case (id, t) =>
        val toks = t.split(" ")
        val j = rnd.nextInt(toks.length)
        (id + 1000L, toks.updated(j, "zz" + rnd.nextInt(5)).mkString(" "))
      }
      val all = base ++ clones
      val threshold = Seq(0.5, 0.7, 0.8)(rnd.nextInt(3))
      val got = Dedup.ngramJaccardPairs(all.toDF("doc_id", "text"),
          "doc_id", "text", 3, threshold)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = all.map { case (id, txt) =>
        id -> txt.split(" ").sliding(3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib && sa.nonEmpty && sb.nonEmpty
        inter = sa.intersect(sb).size
        if inter.toDouble / (sa.size + sb.size - inter) >= threshold
      } yield (ia, ib)).toSet
      assert(got == want,
        s"round $round t=$threshold missed=${want -- got} spurious=${got -- want}")
    }
  }

  test("z-order interleave matches the naive bit loop and is dominance-monotone") {
    import graft.functions.ZOrderOps
    def naive(x: Int, y: Int): Long = {
      var r = 0L
      var i = 0
      while (i < 32) {
        r |= ((x.toLong >>> i) & 1L) << (2 * i)
        r |= ((y.toLong >>> i) & 1L) << (2 * i + 1)
        i += 1
      }
      r
    }
    for (_ <- 1 to 300) {
      val x = rnd.nextInt() & Int.MaxValue
      val y = rnd.nextInt() & Int.MaxValue
      assert(ZOrderOps.interleave(x, y) == naive(x, y), s"x=$x y=$y")
      // dominance monotonicity: shrinking either coord never raises the code
      val x2 = rnd.nextInt(x + 1)
      val y2 = rnd.nextInt(y + 1)
      assert(java.lang.Long.compareUnsigned(
        ZOrderOps.interleave(x2, y2), ZOrderOps.interleave(x, y)) <= 0)
    }
  }

  test("PII redaction is idempotent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val samples = Seq(
      "a@b.io mail", "ip 10.0.0.1 here", "num 123456789 x",
      "mixed a@b.io 1.2.3.4 99999999", "clean text only", "1.2.3 v")
    val once = samples.toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
    val twice = once.select(TextFunctions.redactPii(col("r")))
      .collect().map(_.getString(0))
    assert(twice.toSeq == once.collect().map(_.getString(0)).toSeq)
  }

  test("sampling bucket stays in range and matches the oracle arithmetic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keys = Seq.fill(500)(math.abs(rnd.nextLong() % 10000000L))
    val got = keys.toDF("k")
      .select(graft.operators.Sampling.bucket(col("k")))
      .collect().map(_.getLong(0))
    got.zip(keys).foreach { case (b, k) =>
      assert(b >= 0 && b < 1000)
      assert(b == k % 1000003L * 31L % 1000L, s"key $k")
    }
  }

  test("lshProbes: exact bucket first, then distinct one-bit flips") {
    val nTables = 4; val nPlanes = 8; val dim = 16; val nProbe = 3
    val signs = Array.tabulate(nTables, nPlanes * dim) { (t, pd) =>
      graft.functions.LshBuckets.planeSign(t, pd / dim, pd % dim)
    }
    for (_ <- 1 to 100) {
      val v = new GenericArrayData(Array.fill(dim)(rnd.nextInt(2001) - 1000L))
      val exact = SketchOps.lshBuckets(v, signs, nTables, nPlanes, dim)
      val probes = SketchOps.lshProbes(v, signs, nTables, nPlanes, dim, nProbe)
      assert(probes.numElements() == nTables * nProbe)
      for (t <- 0 until nTables) {
        val slots = (0 until nProbe).map(j => probes.getLong(t * nProbe + j))
        // slot 0 is the exact bucket
        assert(slots.head == exact.getLong(t))
        // every other probe flips exactly ONE plane bit, all distinct
        slots.tail.foreach { p =>
          assert(java.lang.Long.bitCount(p ^ slots.head) == 1,
            s"probe $p is not a single-bit flip of ${slots.head}")
        }
        assert(slots.distinct.size == nProbe, s"duplicate probes: $slots")
      }
    }
  }

  test("maxMultiplicity: in-row sort+fold equals the naive group count on random arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // skewed vocabulary on purpose so real multiplicities (not all-1)
    // appear; includes empty and single-element arrays
    val arrays: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("x")) ++
        (1 to 60).map(_ => Seq.fill(1 + rnd.nextInt(40))("w" + rnd.nextInt(6)))
    val got = arrays.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("i", "arr")
      .select(col("i"), TextFunctions.maxMultiplicity(col("arr")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val want = if (a.isEmpty) 0 else a.groupBy(identity).values.map(_.size).max
      assert(got(i) == want, s"array $i: got ${got(i)}, want $want ($a)")
    }
  }
}
