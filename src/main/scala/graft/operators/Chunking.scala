package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window document chunking — the retrieval-pipeline splitter
  * that turns each document into overlapping fixed-size token windows
  * (RAG chunking, context-window packing, embedding-input prep).
  *
  * Window rule (the canonical sliding-window contract): starts at
  * `0, stride, 2·stride, …`; the LAST window is the first one whose
  * end reaches the document's end, so every token is covered, chunks
  * overlap by exactly `size - stride` tokens, and no start beyond the
  * end is emitted. A doc with `n <= size` tokens yields exactly one
  * chunk. Number of chunks: `1 + ceil(max(0, n - size) / stride)`.
  *
  * Scale design: pure narrow map work — `split` + `posexplode` over a
  * computed `sequence()` of window indexes, then `slice`/`array_join`
  * on the token array. No shuffle, no window function, no UDF; the
  * whole stage stays inside WholeStageCodegen and scales linearly
  * with corpus bytes. Chunk ids are `(doc_id, chunk_idx)` — globally
  * unique without any coordination.
  */
object Chunking {

  /** Explode `textCol` into overlapping token windows.
    *
    * Output: `(doc_id, chunk_idx, chunk_start, chunk_tokens,
    * chunk_text)` where `chunk_start` is the 0-based token offset and
    * `chunk_tokens` the actual token count (only the last chunk of a
    * doc may be short).
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = split(col(textCol), " ")
    val n = org.apache.spark.sql.functions.size(toks) // `size` param shadows the function

    // 1 + ceil(max(0, n - size) / stride) windows, as a pure int expr.
    val nChunks = lit(1) +
      (greatest(n - lit(size), lit(0)) + lit(stride - 1)) / lit(stride)
    df.select(col(idCol).as("doc_id"), toks.as("toks"), n.as("n_toks"),
        nChunks.cast("int").as("n_chunks"))
      .select(col("doc_id"), col("toks"), col("n_toks"),
        posexplode(sequence(lit(0), col("n_chunks") - 1)))
      .select(col("doc_id"),
        col("col").cast("long").as("chunk_idx"),
        (col("col") * stride).cast("long").as("chunk_start"),
        least(lit(size), col("n_toks") - col("col") * stride)
          .cast("long").as("chunk_tokens"),
        array_join(slice(col("toks"), col("col") * stride + 1, lit(size)), " ")
          .as("chunk_text"))
  }
}
