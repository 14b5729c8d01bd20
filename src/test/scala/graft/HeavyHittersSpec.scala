package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def toks = Tables(spark, sf).documents
    .select(explode(split($"text", " ")).as("token"))
    .filter(length($"token") > 0)

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .agg(HeavyHitters.heavy_hitters_agg($"token", k))
    .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every guaranteed-heavy token is present with bounded undercount") {
    val k = 50
    val t = toks.cache()
    val n = t.count()
    val exact = t.groupBy($"token").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = sketch(t, k)
    val bound = n / (k + 1)
    val heavy = exact.filter { case (_, c) => c * (k + 1) > n }
    assert(heavy.nonEmpty, "test corpus must have heavy tokens for this to bite")
    heavy.foreach { case (tok, c) =>
      assert(sk.contains(tok), s"guaranteed-heavy '$tok' (cnt=$c) missing")
    }
    // MG counters only ever under-count, by at most n/(k+1)
    sk.foreach { case (tok, c) =>
      val e = exact(tok)
      assert(c <= e, s"'$tok' overcounted: $c > $e")
      assert(e - c <= bound, s"'$tok' undercount ${e - c} > $bound")
    }
    assert(sk.size <= k)
  }

  test("the guarantee is partitioning-invariant (mergeable summaries)") {
    val k = 50
    val t = toks.cache()
    val n = t.count()
    val heavy = t.groupBy($"token").agg(count(lit(1)).as("c"))
      .filter($"c" * (k + 1) > lit(n))
      .collect().map(_.getString(0)).toSet
    Seq(1, 7, 32).foreach { parts =>
      val sk = sketch(t.repartition(parts), k)
      assert(heavy.subsetOf(sk.keySet), s"lost a heavy token at $parts partitions")
    }
  }

  test("k >= distinct count degrades to exact counting") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("token")
    val sk = sketch(df, 10)
    assert(sk == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  private def wsketch(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .agg(HeavyHitters.weighted_heavy_hitters_agg($"token", $"w", k))
    .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("a weight-w update is exactly w unit updates (single fold)") {
    // one partition, one deterministic row order on both sides — the
    // folds are then literally comparable, counter for counter. k is
    // chosen SMALLER than the distinct token count so the decrement
    // path (including partial weight absorption, w > min) really runs.
    val t = Tables(spark, sf).documents
      .select(explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
      .withColumn("w", length($"token").cast("long"))
      .orderBy($"token").limit(5000)
      .coalesce(1).sortWithinPartitions($"token")
    val k = 7
    val weighted = wsketch(t, k)
    val expanded = t
      .select($"token", explode(sequence(lit(1L), $"w")).as("u"))
      .coalesce(1).sortWithinPartitions($"token", $"u")
      .select($"token")
    val unit = expanded
      .agg(HeavyHitters.heavy_hitters_agg($"token", k))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weighted == unit)
  }

  test("weighted guarantee: every char-heavy token survives, any partitioning") {
    val k = 50
    val t = toks.withColumn("w", length($"token").cast("long")).cache()
    val wTotal = t.agg(sum($"w")).collect()(0).getLong(0)
    val heavy = t.groupBy($"token").agg(sum($"w").as("ew"))
      .filter($"ew" * (k + 1) > lit(wTotal))
      .collect().map(_.getString(0)).toSet
    assert(heavy.nonEmpty)
    Seq(1, 13, 32).foreach { parts =>
      val sk = wsketch(t.repartition(parts), k)
      assert(heavy.subsetOf(sk.keySet), s"lost a heavy token at $parts partitions")
    }
  }
}
