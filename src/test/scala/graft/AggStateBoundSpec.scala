package graft

import graft.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the state-size classification the session's
  * `objectHashAggregate.sortBased.fallbackThreshold = 65536` relies
  * on (GraftSession.scala settings rationale): the threshold bounds
  * how many TypedImperativeAggregate states a task holds in memory
  * CONCURRENTLY before falling back to sort-based aggregation, so its
  * safe ceiling is memory ÷ max-state-size.
  *
  * Three classes, and the walk below fails when a NEW aggregate is
  * added without classifying it here:
  * - bounded, measured: state size is capped by constructor params
  *   regardless of input volume — fed 200k distinct values, the
  *   serialized state must stay under the per-class cap, and
  *   64k × the largest cap must fit the documented ≈2 GB/task budget.
  * - bounded as base: merge-forms whose state type IS the base
  *   form's (same cap applies; feeding them requires synthesizing
  *   serialized states, which measures the base path twice).
  * - data-proportional: sumMap (distinct keys per group) and
  *   groupBitmap (touched 65k-id buckets per group) grow with the
  *   group's data. No threshold value makes them memory-safe at
  *   unbounded per-group cardinality; the EARLY sort fallback is
  *   their protection (caps concurrent growing states), which is
  *   exactly why the session threshold must stay moderate — r15's
  *   4M-entry setting was reverted on this argument.
  */
class AggStateBoundSpec extends AnyFunSuite {

  private val longIn = BoundReference(0, LongType, nullable = true)
  private val dblIn = BoundReference(0, DoubleType, nullable = true)
  private val strIn = BoundReference(0, StringType, nullable = true)
  private val arrIn =
    BoundReference(0, ArrayType(LongType, containsNull = false), nullable = true)
  private val wLongIn = BoundReference(1, LongType, nullable = true)

  private val N = 200000

  private def feed[B](agg: TypedImperativeAggregate[B],
      row: Int => InternalRow): Int = {
    var buf = agg.createAggregationBuffer()
    var i = 0
    while (i < N) { buf = agg.update(buf, row(i)); i += 1 }
    agg.serialize(buf).length
  }

  private def mix(i: Int): Long = {
    // spread inputs like real hashed data so register/bucket touch
    // patterns are realistic, not sequential
    val h = i.toLong * 0x9E3779B97F4A7C15L
    val x = h ^ (h >>> 33)
    x * 0xFF51AFD7ED558CCDL
  }

  private def lrow(i: Int): InternalRow = new GenericInternalRow(Array[Any](mix(i)))
  private def drow(i: Int): InternalRow =
    new GenericInternalRow(Array[Any](math.abs(mix(i)).toDouble / Long.MaxValue * 100 + 0.001))
  private def srow(i: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString("item-" + (i % 37))))

  // (name, gate-representative instance → measured serialized bytes,
  //  documented per-state cap in bytes)
  private def boundedMeasured: Seq[(String, () => Int, Int)] = Seq(
    ("BloomAgg", () => feed(BloomAgg(longIn, numBits = 1 << 20, numHashes = 5), lrow),
      (1 << 20) / 8 + 64),
    ("CountMinAgg", () => feed(CountMinAgg(longIn, depth = 5, width = 2048), lrow),
      5 * 2048 * 8 + 64),
    ("DdSketchAgg", () => feed(DdSketchAgg(dblIn, alpha = 0.01, maxBuckets = 2048), drow),
      2048 * 16 + 128),
    ("UniqUpToAgg", () => feed(UniqUpToAgg(longIn, n = 1000), lrow), 1001 * 8 + 64),
    ("HeavyHittersAgg", () => feed(HeavyHittersAgg(strIn, k = 100), srow),
      100 * 64 + 64),
    ("WeightedHeavyHittersAgg", () => feed(
      WeightedHeavyHittersAgg(strIn, wLongIn, k = 100),
      i => new GenericInternalRow(
        Array[Any](UTF8String.fromString("item-" + (i % 37)), 2L))),
      100 * 64 + 64),
    ("HistogramAgg", () => feed(HistogramAgg(dblIn, nBins = 64), drow),
      64 * 32 + 128),
    ("HllAgg", () => feed(HllAgg(longIn, p = 12), lrow), 4096 * 8 + 64),
    ("KmvAgg", () => feed(KmvAgg(longIn, k = 1024), lrow), 1024 * 8 + 64),
    ("MinHashAgg", () => feed(MinHashAgg(arrIn, k = 128),
      i => new GenericInternalRow(
        Array[Any](new GenericArrayData(Array(mix(i), mix(i + N)))))),
      129 * 8 + 64),
    ("TDigestAgg", () => feed(TDigestAgg(dblIn, delta = 100), drow),
      // t-digest centroid count is O(delta) with a transient unmerged
      // buffer; 100 × (mean, weight) doubles plus slack
      100 * 16 * 8 + 256),
    ("TopKAgg", () => feed(TopKAgg(dblIn, wLongIn, k = 1),
      i => new GenericInternalRow(Array[Any](i.toDouble, i.toLong))), 64),
    ("VecMeanAgg", () => feed(VecMeanAgg(arrIn, dim = 64),
      i => new GenericInternalRow(
        Array[Any](new GenericArrayData(Array.fill(64)(mix(i)))))),
      65 * 8 + 64)
  )

  private val boundedAsBase =
    Set("DdSketchMergeAgg", "HllMergeAgg", "HistogramMergeAgg", "TDigestMergeAgg")

  // bounded but only ever GLOBAL aggregates in the engine (one state
  // per task, no group-by): their size never multiplies by the
  // fallback threshold. BloomAgg's single call site is
  // Dedup.contaminationScanBloom's `.agg(...)` over the whole eval
  // set — a 128 KB filter broadcast as one row; CountMinAgg's two
  // call sites (HeavyHitters.frequentTokens, q94) are likewise
  // whole-input `.agg(...)` sketches broadcast for probing. The
  // largest GROUPED state is HLL p=12 (Profiling, the uniques gates):
  // 32 KB × 64k = 2.1 GB — the documented worst-case edge.
  private val globalOnly = Set("BloomAgg", "CountMinAgg")

  private val dataProportional = Set("SumMapAgg", "BitmapAgg", "BitmapMergeAgg")

  test("every TypedImperativeAggregate in graft.functions is classified here") {
    // completeness walk over the SOURCE: a new aggregate added without
    // a row in this spec fails the build, so the threshold's safety
    // argument can't silently rot
    val dir = new java.io.File("src/main/scala/graft/functions")
    assert(dir.isDirectory, s"expected to run from the repo root, cwd=${new java.io.File(".").getAbsolutePath}")
    val decl = ("""case class (\w+)\([^)]*\)\s*""" +
      """extends TypedImperativeAggregate""").r
    val found = dir.listFiles().filter(_.getName.endsWith(".scala")).flatMap { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
      decl.findAllMatchIn(txt).map(_.group(1))
    }.toSet
    val classified =
      boundedMeasured.map(_._1).toSet ++ boundedAsBase ++ dataProportional
    assert(found == classified,
      s"unclassified aggregates: ${found -- classified}; " +
        s"stale spec rows: ${classified -- found}")
  }

  test("bounded aggregates: 200k distinct updates stay under the per-state cap, and 64k states fit the task budget") {
    val sizes = boundedMeasured.map { case (name, run, cap) =>
      val bytes = run()
      assert(bytes <= cap, s"$name state $bytes B exceeds documented cap $cap B")
      name -> bytes
    }
    // the session threshold's safety argument (GraftSession.scala):
    // threshold × largest GROUPABLE bounded state ≤ ~2.2 GB/task worst
    // case (global-only aggregates never multiply by the threshold)
    val threshold = 65536L
    val worst = sizes.filterNot(s => globalOnly(s._1)).map(_._2).max
    assert(threshold * worst <= 2200L * 1024 * 1024,
      s"worst groupable bounded state ${worst} B × $threshold states " +
        "exceeds the documented 2.2 GB/task budget — shrink the " +
        "threshold or the state")
  }

  test("data-proportional aggregates really grow with per-group data (the early-fallback rationale)") {
    // sumMap: distinct keys per group
    val sm = SumMapAgg(arrIn,
      BoundReference(1, ArrayType(LongType, containsNull = false), nullable = true))
    def smRow(i: Int): InternalRow = new GenericInternalRow(Array[Any](
      new GenericArrayData(Array(mix(i))), new GenericArrayData(Array(1L))))
    var smBuf = sm.createAggregationBuffer()
    (0 until 1000).foreach(i => smBuf = sm.update(smBuf, smRow(i)))
    val sm1k = sm.serialize(smBuf).length
    (1000 until 10000).foreach(i => smBuf = sm.update(smBuf, smRow(i)))
    val sm10k = sm.serialize(smBuf).length
    assert(sm10k > sm1k * 5,
      s"sumMap state should grow ~linearly in distinct keys ($sm1k -> $sm10k)")
    // groupBitmap: touched 65k-id buckets per group
    val bm = BitmapAgg(longIn)
    def bmRow(i: Int): InternalRow =
      new GenericInternalRow(Array[Any](i.toLong << 16)) // one bucket per id
    var bmBuf = bm.createAggregationBuffer()
    (0 until 100).foreach(i => bmBuf = bm.update(bmBuf, bmRow(i)))
    val bm100 = bm.serialize(bmBuf).length
    (100 until 1000).foreach(i => bmBuf = bm.update(bmBuf, bmRow(i)))
    val bm1000 = bm.serialize(bmBuf).length
    assert(bm1000 > bm100 * 5,
      s"groupBitmap state should grow with touched buckets ($bm100 -> $bm1000)")
  }
}
