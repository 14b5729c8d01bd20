package graft

import graft.operators.{Compaction, Sampling}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  test("bigram LM surprisal matches a driver-side recompute; rare bigrams score higher") {
    import spark.implicits._
    import graft.operators.LangModel
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the dog sat on the mat"),
      (4L, "zyx qwv"), // every bigram unseen elsewhere
      (5L, "one")      // no bigram — must be absent
    ).toDF("doc_id", "text")
    val got = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver-side model
    val toks = Map(1L -> "the cat sat on the mat", 2L -> "the cat sat on the mat",
      3L -> "the dog sat on the mat", 4L -> "zyx qwv", 5L -> "one")
      .view.mapValues(_.split(" ").toSeq).toMap
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
    assert(got == want)
    assert(!got.contains(5L), "a 1-token doc has no bigram evidence")
    // doc 4's bigram is unique (c12=1) with a rare context — it must
    // out-score the replicated docs on the per-bigram average
    assert(got(4L)._3 > got(1L)._3)
  }

  test("numeric profile: nulls, distincts, bounds, exact sums, constraint verdicts") {
    import spark.implicits._
    import graft.operators.Profiling
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, -2.5), (1.0, 3.5), (null, 0.0)).toDF("a", "b")
    val got = Profiling.numericProfile(df, Seq("a", "b"))
      .orderBy($"col_name").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getBoolean(7), r.getBoolean(8))).toSeq
    assert(got == Seq(
      ("a", 3L, 1L, 1L, 1.0, 1.0, 2.0, false, true),
      ("b", 3L, 0L, 3L, -2.5, 3.5, 1.0, true, false)))
  }

  test("stupid backoff: seen bigrams use MLE, unseen back off to add-one unigrams") {
    import spark.implicits._
    import graft.operators.LangModel
    val train = Seq((1L, "a b c a b"), (2L, "b c d")).toDF("doc_id", "text")
    // doc 10 mixes seen bigrams (a b, b c) with unseen ones through a
    // KNOWN word (b x, x c); doc 11 is entirely unseen words
    val score = Seq((10L, "a b x c"), (11L, "zz yy")).toDF("doc_id", "text")
    val got = LangModel.stupidBackoffSurprisal(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver-side mirror
    val trainToks = Seq("a b c a b", "b c d").map(_.split(" ").toSeq)
    val biT = trainToks.flatMap(t => t.zip(t.drop(1)))
    val c12 = biT.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = biT.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val uni = trainToks.flatten
    val cw = uni.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, v) = (uni.size.toLong, uni.distinct.size.toLong)
    def term(p: (String, String)): Long =
      if (c12.contains(p)) 1000000L * c1(p._1) / c12(p)
      else 1000000L * 5L * (tt + v) / (2L * (cw.getOrElse(p._2, 0L) + 1L))
    val want = Map(10L -> "a b x c", 11L -> "zz yy").map { case (id, txt) =>
      val t = txt.split(" ").toSeq
      val terms = t.zip(t.drop(1)).map(term)
      id -> (terms.size.toLong, terms.sum, terms.sum / terms.size)
    }
    assert(got == want)
    // the all-unseen doc is the most surprising per bigram
    assert(got(11L)._3 > got(10L)._3)
  }

  test("curation funnel: stages shrink monotonically, pack manifest conserves the train set, deterministic") {
    import spark.implicits._
    import graft.operators.Curation
    val docs = Tables(spark, sf).documents.cache()
    val out = Curation.curationFunnel(docs).cache()
    val funnel = out.filter($"stage" =!= "6_pack")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val order = Seq("0_corpus", "1_quality", "2_exact", "3_neardup",
      "4_decontam", "5_train")
    assert(funnel.keySet == order.toSet, s"${funnel.keySet}")
    // every stage only drops rows/tokens, and at this SF each stage
    // actually has survivors
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(funnel(a)._1 >= funnel(b)._1, s"$a -> $b grew in docs")
      assert(funnel(a)._2 >= funnel(b)._2, s"$a -> $b grew in tokens")
    }
    assert(funnel("5_train")._1 > 0L)
    // the pack manifest partitions the train set exactly
    val pack = out.filter($"stage" === "6_pack")
      .agg(sum($"n_docs"), sum($"tok_sum")).head()
    assert(pack.getLong(0) == funnel("5_train")._1)
    assert(pack.getLong(1) == funnel("5_train")._2)
    // bins are contiguous from 0 per source
    val bins = out.filter($"stage" === "6_pack")
      .groupBy($"source").agg(min($"bin").as("mn"), max($"bin").as("mx"),
        countDistinct($"bin").as("nb")).collect()
    bins.foreach { r =>
      assert(r.getLong(1) == 0L || r.getAs[Long]("mn") == 0L)
      assert(r.getAs[Long]("nb") == r.getAs[Long]("mx") + 1)
    }
    // deterministic under repartitioning (no rand() anywhere)
    val again = Curation.curationFunnel(docs.repartition(13))
      .orderBy($"stage", $"source", $"bin").collect().toSeq
    assert(again == out.orderBy($"stage", $"source", $"bin").collect().toSeq)
  }

  test("leakage-safe split: near-dup pairs never cross sides; total, deterministic") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup}
    val docs = Tables(spark, sf).documents.cache()
    val split = Curation.leakageSafeSplit(docs, "doc_id", "text").cache()
    // total: every doc exactly once
    assert(split.count() == docs.count())
    assert(split.select("doc_id").distinct().count() == docs.count())
    // both sides non-empty at this SF and ~80/20 by cluster hash
    val bySide = split.groupBy($"side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.keySet == Set("train", "valid"), s"$bySide")
    // the property the operator exists for: no near-dup pair crosses
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
    val sides = split.select($"doc_id", $"side")
    val crossers = pairs
      .join(sides.toDF("a", "side_a"), Seq("a"))
      .join(sides.toDF("b", "side_b"), Seq("b"))
      .filter($"side_a" =!= $"side_b").count()
    assert(crossers == 0L, "a near-dup pair crossed the split")
    // deterministic under repartitioning (no rand() anywhere)
    val again = Curation.leakageSafeSplit(docs.repartition(13), "doc_id", "text")
    assert(again.orderBy($"doc_id").collect().toSeq ==
      split.orderBy($"doc_id").collect().toSeq)
  }

  test("weighted sample: deterministic, k per group, weight-monotone inclusion") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents.cache()
    val a = Sampling.weightedSample(docs, "source", "doc_id", $"n_chars", k = 5)
      .orderBy($"source", $"priority").collect().toSeq
    val b = Sampling.weightedSample(docs.repartition(13), "source", "doc_id",
      $"n_chars", k = 5).orderBy($"source", $"priority").collect().toSeq
    assert(a == b, "partitioning must not change the sample")
    val perGroup = a.groupBy(_.getAs[String]("source")).view.mapValues(_.size)
    assert(perGroup.values.forall(_ == 5), perGroup.toMap.toString)
    // weight-monotone inclusion: across many salted draws, a doc with
    // weight 10x another's must be sampled more often. Salt the key to
    // simulate independent draws (the scheme itself stays per-salt
    // deterministic).
    val skew = Seq((1L, 600L), (2L, 60L), (3L, 60L), (4L, 60L), (5L, 60L),
      (6L, 60L), (7L, 60L), (8L, 60L), (9L, 60L), (10L, 60L))
      .toDF("id", "w").cache()
    val hits = (0 until 200).map { salt =>
      Sampling.weightedSample(
          skew.select(lit("g").as("g"), ($"id" + salt * 1009L).as("id"), $"w"),
          "g", "id", $"w", k = 2)
        .select(($"id" - salt * 1009L).as("orig"))
        .as[Long].collect().toSet
    }
    val heavy = hits.count(_.contains(1L)).toDouble / hits.size
    val light = hits.map(h => (h - 1L).size).sum.toDouble / hits.size / 9
    assert(heavy > 3 * light,
      s"10x weight should dominate inclusion: heavy=$heavy lightAvg=$light")
  }

  test("temperature mixture: sqrt quotas, deterministic fill, partition-invariant") {
    import spark.implicits._
    // weights 400/100/100 → isqrt 20/10/10, tot 40: quotas 10/5/5 of 20
    val rows = (0 until 20).flatMap { i =>
      Seq(("big", i.toLong, 20L), ("s1", 100L + i, 5L), ("s2", 200L + i, 5L))
    }.toDF("source", "doc_id", "w").cache()
    val mix = Sampling.temperatureMixture(rows, "source", "doc_id", $"w", totalK = 20)
    val got = mix.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byShare = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byShare == Map("big" -> 10, "s1" -> 5, "s2" -> 5), byShare.toString)
    assert(got.filter(_._1 == "big").forall(_._4 == 10L)) // quota column
    // pure function of the key: partitioning must not change the mix
    val again = Sampling.temperatureMixture(rows.repartition(13),
        "source", "doc_id", $"w", totalK = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
    // fill order is (bucket, key) ascending within each source
    val bigRanks = got.filter(_._1 == "big").sortBy(_._2).map(_._3)
    val expect = (0L until 20L).map(id => (id % 1000003 * 31 % 1000, id))
      .sorted.take(10).map(_._2).toSet
    assert(bigRanks.toSet == expect, s"got ${bigRanks.toSet}, want $expect")
  }

  test("temperature mixture rejects keys outside [0, 2^40) loudly") {
    import spark.implicits._
    val bad = Seq(("a", 1L << 41, 5L), ("a", 1L, 5L))
      .toDF("source", "doc_id", "w")
    val e = intercept[Exception] {
      Sampling.temperatureMixture(bad, "source", "doc_id", $"w", totalK = 2)
        .collect()
    }
    assert(e.getMessage.contains("2^40") ||
      Option(e.getCause).exists(_.getMessage.contains("2^40")),
      s"violation must fail loudly, not mis-sample: ${e.getMessage}")
  }

  test("deterministic split is a pure function of the key") {
    val docs = Tables(spark, sf).documents
    val a = Sampling.withSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment at any partitioning and under data growth (a
    // subset sees identical buckets)
    val b = Sampling.withSplit(docs.repartition(13).limit(100), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1))
    b.foreach { case (id, s) => assert(a(id) == s, s"doc $id flipped split") }
    // proportions roughly 80/10/10
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("valid") - 0.1) < 0.04, frac.toString)
  }

  test("deterministic sample equals the split's bucket predicate") {
    val docs = Tables(spark, sf).documents
    val n = Sampling.sampled(docs, "doc_id", permille = 100).count()
    val total = docs.count()
    assert(n > 0 && n < total)
    assert(math.abs(n.toDouble / total - 0.1) < 0.04, s"$n/$total")
  }

  test("compaction bounds rows per file and range-clusters footer stats") {
    import java.nio.file.{Files => JFiles, Paths}
    val docs = Tables(spark, sf).documents.select(col("doc_id"), col("source"))
    val total = docs.count()
    val dir = JFiles.createTempDirectory("graft-compact").toString
    Compaction.compactTo(docs, dir, maxRecordsPerFile = 100,
      nFiles = math.ceil(total / 100.0).toInt, clusterBy = Seq("doc_id"))
    val files = JFiles.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(files.length >= total / 100,
      s"expected >=${total / 100} files, got ${files.length}")
    assert(files.forall(_.endsWith(".zstd.parquet")),
      s"compacted files should carry the zstd codec: ${files.head}")
    // per-file row bound AND non-overlapping doc_id ranges (footer
    // stats selective => downstream scans can prune)
    val ranges = files.map { f =>
      val d = spark.read.parquet(f)
      assert(d.count() <= 100, s"file $f exceeds maxRecordsPerFile")
      val r = d.agg(min("doc_id"), max("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, "file key ranges overlap")
      case _ =>
    }
  }

  test("z-order clustering keeps BOTH dimensions' footer ranges selective") {
    import java.nio.file.{Files => JFiles, Paths}
    import spark.implicits._
    // 64×64 grid: every (x, y) in [0,64)² once — 4096 rows, 16 files
    val grid = spark.range(64 * 64)
      .select(($"id" % 64).cast("int").as("x"), ($"id" / 64).cast("int").as("y"))
      .withColumn("z", graft.functions.ZOrder2.zorder($"x", $"y"))
    val dir = JFiles.createTempDirectory("graft-zorder").toString
    Compaction.compactTo(grid, dir, maxRecordsPerFile = 512, nFiles = 16,
      clusterBy = Seq("z"))
    val files = JFiles.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(files.length == 16, s"got ${files.length} files")
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("z"), max("z"), min("x"), max("x"), min("y"), max("y"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
    }.sortBy(_._1)
    // z ranges disjoint (range partitioning) → the footer stats of the
    // clustering key prune perfectly
    stats.sliding(2).foreach {
      case Array((_, hi, _, _, _, _), (lo2, _, _, _, _, _)) =>
        assert(hi < lo2, "file z ranges overlap")
      case _ =>
    }
    // and BOTH raw dimensions stay selective: a 16-way z-split of a
    // 64×64 grid gives per-file spans ≤ half the 0..63 global span
    // (range clustering by x alone would leave y's span at 63 in
    // every file)
    val avgXSpan = stats.map(s => s._4 - s._3).sum.toDouble / stats.length
    val avgYSpan = stats.map(s => s._6 - s._5).sum.toDouble / stats.length
    assert(avgXSpan <= 32.0, s"avg x span $avgXSpan")
    assert(avgYSpan <= 32.0, s"avg y span $avgYSpan")
  }

  test("LM hashed collapse: zero 64-bit content-hash collisions on the corpus; audit is queryable") {
    import spark.implicits._
    import graft.operators.LangModel
    val docs = Tables(spark, sf).documents.select($"doc_id", $"text")
    // the collapse/fan-out keys on xxhash64(text): the audit must come
    // back empty (the ~n^2/2^65 argument made checkable), and the gate
    // oracles (which group by raw text) would surface any collision
    assert(LangModel.hashCollisions(docs, "text").isEmpty)
    // and a FORCED collision is visible to the audit: two distinct
    // texts mapped through the same key is exactly what it reports
    val forged = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("doc_id", "text")
      .withColumn("text", lit("same")) // all texts identical -> 1 group, no collision
    assert(LangModel.hashCollisions(forged, "text").isEmpty)
  }

  test("LM surprisal overflow guard: a sum that cannot be certified raises, normal corpora pass") {
    import spark.implicits._
    import graft.operators.LangModel
    // normal corpus: guard is invisible (scores flow)
    val train = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c d")).toDF("doc_id", "text")
    assert(LangModel.stupidBackoffSurprisal(train, score, "doc_id", "text")
      .count() == 1L)
    // the guard's arithmetic: a wrapped sum of positives lands below
    // the group max after one wrap, and multi-wrap is excluded by the
    // n*max < 2^64 certificate -- checked host-side to pin the bound
    val mx = Long.MaxValue / 3
    val wrapped = mx + mx + mx + mx // 4*mx overflows int64
    assert(wrapped < mx, "one-wrapped positive sum must land below max term")
  }

  test("profile verdicts are total: all-null column reads non_negative=true, complete=false") {
    import spark.implicits._
    import graft.operators.Profiling
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 1.0), (null, -2.0)).toDF("an", "b")
    val got = Profiling.numericProfile(df, Seq("an", "b"))
      .orderBy($"col_name").collect().map(r =>
        (r.getString(0), r.getBoolean(7), r.getBoolean(8))).toSeq
    // an: all-null -> complete=false, non_negative=TRUE (not null --
    // a loader reading the verdict as Boolean must never NPE)
    assert(got == Seq(("an", false, true), ("b", true, false)))
  }

  test("approx profile: HLL cardinality inside the 3-sigma envelope; nulls excluded like countDistinct") {
    import spark.implicits._
    import graft.operators.Profiling
    val p = 12
    val docs = Tables(spark, sf).documents
      .select($"n_chars".cast("double").as("nc"),
        when($"doc_id" % 7 === 0, lit(null).cast("double"))
          .otherwise($"doc_id".cast("double")).as("idn"))
    val ap = Profiling.approxProfile(docs, Seq("nc", "idn"), p)
      .orderBy($"col_name").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val ex = Profiling.numericProfile(docs, Seq("nc", "idn"))
      .orderBy($"col_name").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val envelope = 3 * 1.04 / math.sqrt((1 << p).toDouble)
    for (c <- Seq("nc", "idn")) {
      assert(ap(c)._1 == ex(c)._1, "n_nulls must be exact in both forms")
      val (est, exact) = (ap(c)._2, ex(c)._2)
      assert(math.abs(est - exact) <= math.max(exact * envelope, 1.0),
        s"$c: est $est vs exact $exact outside envelope")
    }
    // all-null column: estimate must be 0, not 1 (nulls do not hash)
    val an = Seq[java.lang.Double](null, null).toDF("an")
    val r = Profiling.approxProfile(an, Seq("an"), p).collect()(0)
    assert(r.getLong(3) == 0L)
    assert(r.getBoolean(8), "all-null approx profile verdict stays total")
  }
}
