package graft

import graft.operators.Chunking
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables(spark, sf).documents.cache()

  test("chunk count, starts and sizes follow the sliding-window contract") {
    val size = 32; val stride = 24
    val chunks = Chunking.tokenWindows(docs, "doc_id", "text", size, stride)
    val byDoc = chunks.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        max($"chunk_start" + $"chunk_tokens").as("covered_end"),
        min($"chunk_tokens").as("min_tokens"))
    val n = docs.select($"doc_id",
      org.apache.spark.sql.functions.size(split($"text", " ")).cast("long").as("n_toks"))
    val joined = byDoc.join(n, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nc, end, nt) = (r.getAs[Long]("n_chunks"),
        r.getAs[Long]("covered_end"), r.getAs[Long]("n_toks"))
      assert(nc == 1 + math.ceil(math.max(0L, nt - size) / stride.toDouble).toLong,
        s"doc ${r.getAs[Long]("doc_id")}: $nc chunks for $nt tokens")
      // the last chunk's end reaches the doc's end exactly
      assert(end == nt, s"doc ${r.getAs[Long]("doc_id")}: covered to $end of $nt")
      assert(r.getAs[Long]("min_tokens") >= 1)
    }
  }

  test("consecutive chunks overlap by exactly size - stride tokens") {
    val chunks = Chunking.tokenWindows(docs, "doc_id", "text", 32, 24)
    val gaps = chunks.as("a").join(chunks.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.chunk_idx") + 1 === col("b.chunk_idx"))
      .select((col("b.chunk_start") - col("a.chunk_start")).as("step"))
      .distinct().as[Long].collect().toSet
    assert(gaps == Set(24L), s"steps: $gaps")
  }

  test("stride == size partitions the doc: chunks concatenate back to the text") {
    val rebuilt = Chunking.tokenWindows(docs, "doc_id", "text", 16, 16)
      .groupBy($"doc_id")
      // chunk_idx order; array_join over the collected list
      .agg(array_join(array_sort(collect_list(struct($"chunk_idx", $"chunk_text")))
        .getField("chunk_text"), " ").as("rebuilt"))
    val bad = rebuilt.join(docs, "doc_id")
      .filter($"rebuilt" =!= $"text").count()
    assert(bad == 0)
  }

  test("a doc shorter than the window yields exactly one full-doc chunk") {
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Chunking.tokenWindows(tiny, "doc_id", "text", 32, 24).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("chunk_idx") == 0L && r.getAs[Long]("chunk_start") == 0L
      && r.getAs[Long]("chunk_tokens") == 3L && r.getAs[String]("chunk_text") == "a b c")
  }

  test("the chunking plan is shuffle-free (pure narrow map work)") {
    val plan = Chunking.tokenWindows(docs, "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
