package graft

import graft.operators.Spans
import org.apache.spark.sql.functions._

class SpanSpec extends SparkSpec {

  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("a planted mid-document shared passage comes back as ONE maximal span") {
    // doc 1: 20 unique tokens, then the 15-token passage, then 10 more
    // doc 2: 5 unique tokens, then the same passage, then 20 more
    val passage = toks("dup", 15)
    val docs = Seq(
      (1L, s"${toks("a", 20)} $passage ${toks("b", 10)}"),
      (2L, s"${toks("c", 5)} $passage ${toks("d", 20)}")).toDF("doc_id", "text")
    val out = Spans.sharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 50).collect()
    assert(out.length == 1, s"got ${out.mkString("; ")}")
    val r = out.head
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("a_start") == 20L, "span starts at doc 1's passage offset")
    assert(r.getAs[Long]("b_start") == 5L, "span starts at doc 2's passage offset")
    assert(r.getAs[Long]("span_tokens") == 15L, "maximal, not per-k-gram")
  }

  test("two separate shared passages in one pair yield two spans, not a merged one") {
    val p1 = toks("x", 12); val p2 = toks("y", 13)
    val docs = Seq(
      (1L, s"$p1 ${toks("m", 10)} $p2"),
      (2L, s"$p2 ${toks("n", 15)} $p1")).toDF("doc_id", "text")
    val out = Spans.sharedSpans(docs, "doc_id", "text",
        k = 8, minSpanTokens = 12, maxDocFreq = 50)
      .orderBy($"a_start").collect()
    assert(out.length == 2, s"got ${out.mkString("; ")}")
    assert(out(0).getAs[Long]("a_start") == 0L &&
      out(0).getAs[Long]("b_start") == 28L &&
      out(0).getAs[Long]("span_tokens") == 12L)
    assert(out(1).getAs[Long]("a_start") == 22L &&
      out(1).getAs[Long]("b_start") == 0L &&
      out(1).getAs[Long]("span_tokens") == 13L)
  }

  test("sub-threshold overlaps (>= k but < minSpanTokens) are filtered") {
    val short = toks("s", 9) // 9 shared tokens: 2 matching 8-grams, < 12
    val docs = Seq(
      (1L, s"${toks("a", 10)} $short"),
      (2L, s"$short ${toks("b", 10)}")).toDF("doc_id", "text")
    val out = Spans.sharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 50)
    assert(out.count() == 0)
  }

  test("the doc-frequency cap drops corpus-wide boilerplate spans") {
    val boiler = toks("bp", 14)
    // the same passage in 6 docs: with maxDocFreq=5 every one of its
    // grams is a stop-gram, so no span survives; with the cap lifted
    // all 15 pairs report it
    val docs = (1L to 6L)
      .map(i => (i, s"${toks(s"u$i", 10)} $boiler")).toDF("doc_id", "text")
    val capped = Spans.sharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 5)
    assert(capped.count() == 0)
    val uncapped = Spans.sharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 50)
    assert(uncapped.count() == 15)
  }

  test("the occurrence cap drops a degenerate mono-gram doc's postings") {
    // doc 2 repeats one token 3500 times: every one of its 8-grams is
    // a single gram with ~3493 occurrences — past maxOccs, so the
    // posting is a stop-gram and no span against doc 1 is reported
    // (without the cap the pair explode would square on it)
    val mono = Array.fill(3500)("z").mkString(" ")
    val docs = Seq(
      (1L, s"${toks("a", 10)} ${Array.fill(20)("z").mkString(" ")}"),
      (2L, mono)).toDF("doc_id", "text")
    val out = Spans.sharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 50)
    assert(out.count() == 0)
    // excision on the same corpus: nothing removed, docs intact
    val clean = Spans.removeSharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 50)
    assert(clean.filter($"n_removed" =!= 0L).count() == 0)
  }

  test("span offsets point at genuinely identical token runs (sf corpus)") {
    val docs = Tables(spark, sf).documents
    val spans = Spans.sharedSpans(docs, "doc_id", "text",
      k = 8, minSpanTokens = 12, maxDocFreq = 50)
    val checked = spans
      .join(docs.select($"doc_id".as("a"), split($"text", " ").as("ta")), "a")
      .join(docs.select($"doc_id".as("b"), split($"text", " ").as("tb")), "b")
      .select(
        (slice($"ta", ($"a_start" + 1).cast("int"), $"span_tokens".cast("int")) ===
          slice($"tb", ($"b_start" + 1).cast("int"), $"span_tokens".cast("int")))
          .as("identical"))
      .collect()
    assert(checked.nonEmpty, "sf corpus should contain shared spans")
    assert(checked.forall(_.getAs[Boolean]("identical")))
  }

  test("span excision cuts the passage from the higher-id doc only") {
    val passage = toks("dup", 15)
    val head2 = toks("c", 5); val tail2 = toks("d", 20)
    val docs = Seq(
      (1L, s"${toks("a", 20)} $passage ${toks("b", 10)}"),
      (2L, s"$head2 $passage $tail2")).toDF("doc_id", "text")
    val out = Spans.removeSharedSpans(docs, "doc_id", "text",
        k = 8, minSpanTokens = 12, maxDocFreq = 50)
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0L, "keep-first: doc 1 intact")
    assert(out(0).getAs[String]("clean_text").split(" ").length == 45)
    assert(out(1).getAs[Long]("n_removed") == 15L)
    assert(out(1).getAs[String]("clean_text") == s"$head2 $tail2",
      "doc 2 loses exactly the shared passage, order preserved")
  }

  test("a doc fully contained in an earlier doc is emptied, not dropped") {
    val body = toks("x", 30)
    val docs = Seq(
      (1L, s"$body ${toks("y", 10)}"),
      (2L, body)).toDF("doc_id", "text")
    val out = Spans.removeSharedSpans(docs, "doc_id", "text",
        k = 8, minSpanTokens = 12, maxDocFreq = 50)
      .orderBy($"doc_id").collect()
    assert(out.length == 2, "emptied docs still appear")
    assert(out(1).getAs[String]("clean_text") == "" &&
      out(1).getAs[Long]("n_removed") == 30L)
    assert(out(0).getAs[Long]("n_removed") == 0L)
  }

  test("overlapping spans on one doc remove the union, not double-count") {
    // doc 3 shares [p1 p2] with doc 1 and [p2 p3] with doc 2: the two
    // cut intervals overlap on p2's tokens; union coverage = 36 tokens
    val p1 = toks("p", 12); val p2 = toks("q", 12); val p3 = toks("r", 12)
    val docs = Seq(
      (1L, s"$p1 $p2 ${toks("u", 9)}"),
      (2L, s"${toks("v", 9)} $p2 $p3"),
      (3L, s"$p1 $p2 $p3")).toDF("doc_id", "text")
    val out = Spans.removeSharedSpans(docs, "doc_id", "text",
        k = 8, minSpanTokens = 12, maxDocFreq = 50)
      .orderBy($"doc_id").collect()
    assert(out(2).getAs[Long]("n_removed") == 36L,
      s"union coverage, got ${out(2).getAs[Long]("n_removed")}")
    assert(out(2).getAs[String]("clean_text") == "")
  }

  test("the span plan has no cartesian or nested-loop join") {
    val plan = Spans.sharedSpans(Tables(spark, sf).documents,
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join shape:\n$plan")
  }
}
