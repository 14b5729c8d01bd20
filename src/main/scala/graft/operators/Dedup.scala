package graft.operators

import graft.functions.Murmur3Hash64.hash64
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the large-scale pipeline extensions:
  * exact (content-hash groupBy), n-gram Jaccard (exact set overlap),
  * MinHash+LSH (banded signatures → candidate pairs → exact verify),
  * SimHash (64-bit sketch + pigeonhole chunk blocking).
  *
  * Scale design: every stage is a groupBy/join on a key that
  * partitions well. The MinHash path never materializes the O(n²)
  * pair space — candidates come from band-bucket joins, which at
  * 100 TB is the difference between feasible and not. The exact-verify
  * join touches only candidate pairs.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. */
  def exactDedup(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) pairs — distinct word n-gram shingles per doc. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(TextFunctions.shingleSet(col(textCol), n)).as("sh"))

  /** Exact n-gram Jaccard similar pairs (a < b, jaccard >= threshold).
    * Pair generation is bounded by shared-shingle co-occurrence — an
    * inverted-index join, not a cross join.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy($"doc").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("a"), col("y.doc").as("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard", $"i".cast("double") / ($"sa" + $"sb" - $"i"))
      .filter($"jaccard" >= threshold)
      .select($"a", $"b", $"jaccard")
  }

  private implicit class Dollar(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.parts.mkString)
  }

  /** MinHash signatures: one row per doc with sig_0..sig_{k-1} columns
    * (min over the doc's shingle hashes under k independent hash
    * functions h_i(x) = xxhash64(i, x) — seeded rehash instead of the
    * classic a·x+b permutation, which would wrap around Long and trip
    * ANSI overflow checks). Partial (map-side) min aggregation keeps
    * the shuffle tiny at scale.
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val hashed = sh.select($"doc", hash64($"sh").as("h"))
    val aggs = (0 until k).map { i =>
      min(xxhash64(lit(i), $"h")).as(s"sig_$i")
    }
    hashed.groupBy($"doc").agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** LSH candidate pairs from banded signatures (bands × rowsPerBand =
    * k). Docs matching in any band become candidates. P(candidate) =
    * 1-(1-j^r)^b — with b=32, r=4 a jaccard-0.8 pair is missed with
    * probability < 5e-8.
    */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { j =>
      val cols = (0 until rowsPerBand).map(r => col(s"sig_${j * rowsPerBand + r}"))
      sigs.select($"doc", lit(j).as("band"), xxhash64(cols: _*).as("bucket"))
    }.reduce(_ unionByName _)
    bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline with exact verification:
    * shingle → sign → band → candidate → exact jaccard filter.
    * Output equals [[ngramJaccardPairs]] up to the (negligible) LSH
    * miss probability, at a fraction of the join cost on large n.
    */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, k: Int = 128, bands: Int = 32): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val sigs = minhashSignatures(sh, k)
    val cands = lshCandidates(sigs, bands, k / bands)
    val sizes = sh.groupBy($"doc").agg(count(lit(1)).as("sz"))
    // exact verify on candidates only
    val inter = cands
      .join(sh.as("x"), $"a" === col("x.doc"))
      .join(sh.as("y"), $"b" === col("y.doc") && col("x.sh") === col("y.sh"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("doc", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard", $"i".cast("double") / ($"sa" + $"sb" - $"i"))
      .filter($"jaccard" >= threshold)
      .select($"a", $"b", $"jaccard")
  }

  /** 64-bit SimHash over word tokens (bag-weighted): bit i of the
    * sketch is the sign of Σ_tokens count · (±1 per token-hash bit i).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy($"doc", $"t").agg(count(lit(1)).as("w"))
      .withColumn("h", hash64($"t"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, $"w").otherwise(-$"w")).as(s"b_$i")
    }
    val sums = tok.groupBy($"doc").agg(bitSums.head, bitSums.tail.toIndexedSeq: _*)
    val sketch = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ bitwiseOR _)
    sums.select($"doc", sketch.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance, blocked on 16-bit
    * chunks (pigeonhole: hamming <= 3 guarantees one equal chunk; the
    * block join is what avoids O(n²) at scale).
    */
  def simhashPairs(sketches: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = (0 until 4).map { c =>
      sketches.select($"doc", $"simhash", lit(c).as("chunk"),
        shiftrightunsigned($"simhash", c * 16).bitwiseAND(0xFFFFL).as("key"))
    }.reduce(_ unionByName _)
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }
}
