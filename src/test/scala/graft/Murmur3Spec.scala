package graft

import graft.functions.{Murmur3, Murmur3ShardCode}

/** Pins the Scala murmur3_128 port against the public MurmurHash3
  * x64_128 specification (Austin Appleby's reference implementation,
  * canonical constants C1=0x87c37b91114253d5, C2=0x4cf5ad432745937f),
  * over UTF-16LE code units — the byte stream guava's
  * `hashUnencodedChars` feeds it, which is what the reference loader
  * shards with (`AbstractClickhouseLoaderMapper.java:60,277`).
  *
  * Two layers of defense against constant drift:
  *   1. hard-coded vectors generated from the bundled guava
  *      (`Hashing.murmur3_128().hashUnencodedChars`) — byte-for-byte
  *      the function the reference calls;
  *   2. a runtime test that calls that same guava directly, so the
  *      vectors themselves can never go stale or be regenerated from
  *      a buggy implementation.
  */
class Murmur3Spec extends SparkSpec {

  // (input, h1, h2, asInt) — guava Hashing.murmur3_128().hashUnencodedChars
  private val vectors = Seq(
    ("", 0L, 0L, 0),
    ("a", -7591212652331886403L, -5586493512232966275L, 189700285),
    ("ab", 2259427178515664481L, -7832054662500177126L, 1128926817),
    ("abc", 875283225144872419L, 8606773463222247467L, -1331802653),
    ("abcdefgh", 2883330415088479922L, -6723333879855918598L, 1768795826),
    ("0123456789abcdefX", -6881853070895694314L, -926156050482866659L, -120275434),
    ("20170107", -1638121449955091098L, 28425652189000631L, 1819975014),
    ("弹幕", 27352908220324639L, -7503138805396733399L, 973855519),
    ("h_did_8827361", 7660617794748933696L, -5522140715299786363L, -267655616),
    ("2017-04-16|pc|弹幕", -6252998218086935156L, -3296256136498764027L, 499586444))

  test("128-bit output matches guava murmur3_128 hashUnencodedChars vectors") {
    vectors.foreach { case (s, h1, h2, _) =>
      assert(Murmur3.hashUnencodedChars(s) == ((h1, h2)), s"mismatch on '$s'")
    }
  }

  test("asInt = low 32 bits of h1 (guava HashCode.asInt contract)") {
    vectors.foreach { case (s, _, _, asInt) =>
      assert(Murmur3.hashStringAsInt(s) == asInt, s"mismatch on '$s'")
    }
  }

  test("runtime parity with the bundled guava on random strings") {
    import com.google.common.hash.Hashing
    val rnd = new scala.util.Random(7)
    val samples = vectors.map(_._1) ++ (0 until 500).map { _ =>
      new String(Array.fill(rnd.nextInt(60))(rnd.nextInt(Char.MaxValue).toChar))
    }
    samples.foreach { s =>
      val hc = Hashing.murmur3_128().hashUnencodedChars(s)
      val bb = java.nio.ByteBuffer.wrap(hc.asBytes())
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val expected = (bb.getLong(), bb.getLong())
      assert(Murmur3.hashUnencodedChars(s) == expected, s"guava mismatch on '$s'")
      assert(Murmur3.hashStringAsInt(s) == hc.asInt(), s"asInt mismatch on '$s'")
    }
  }

  test("reference sharding vector: (asInt & MaxInt) % 3 for \"20170107\"") {
    // ShardingTest.java:19-21 documents the sharding function shape
    assert(Murmur3.shardCode("20170107") == (1819975014 & Int.MaxValue))
    assert(Murmur3.shardCode("20170107") % 3 == 0)
  }

  test("shardCode is non-negative for adversarial inputs") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val s = new String(Array.fill(rnd.nextInt(40))(rnd.nextInt(Char.MaxValue).toChar))
      assert(Murmur3.shardCode(s) >= 0)
    }
  }

  test("catalyst expression matches the Scala function and stays codegen'd") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sf).customer
      .withColumn("code", Murmur3ShardCode.shard_code(col("c_name")))
    df.collect().foreach { r =>
      assert(r.getInt(5) == Murmur3.shardCode(r.getString(1)))
    }
    // whole-stage codegen must cover the projection (no CodegenFallback):
    // the `*(n)` prefix marks WholeStageCodegen spans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("murmur3shardcode"),
      s"plan:\n$plan")
  }
}
