package graft

import graft.functions.{Murmur3, Murmur3ShardCode}

/** Pins the Scala murmur3_128 port against the public MurmurHash3
  * x64_128 specification (Austin Appleby's reference implementation),
  * over UTF-16LE code units — the byte stream guava's
  * `hashUnencodedChars` feeds it, which is what the reference loader
  * shards with (`AbstractClickhouseLoaderMapper.java:60,277`).
  *
  * Vectors below were generated from an independent implementation of
  * the published algorithm (canonical constants C1=0x87c37b91114253d5,
  * C2=0x4cf5ab2ed38fc276).
  *
  * NOTE: the guava jar bundled in this environment's /opt/spark/jars is
  * NOT upstream guava — its murmur3 C2 constant is patched
  * (0x4cf5ad432745937f instead of the canonical 0x4cf5ab2ed38fc276),
  * so its output diverges from every published murmur3_128
  * implementation. We pin to the public algorithm, which is what the
  * reference's real guava dependency implements.
  */
class Murmur3Spec extends SparkSpec {

  // (input, h1, h2, asInt) — canonical murmur3 x64_128 of UTF-16LE bytes
  private val vectors = Seq(
    ("", 0L, 0L, 0),
    ("a", 7626985794003536183L, -1980032586341385537L, -1903687369),
    ("ab", -8526879317918501070L, 342624877745637138L, 215463730),
    ("abc", 4778508168494177520L, -4053725839916102837L, -1822040848),
    ("abcdefgh", -6160016754389939383L, -868597978211821040L, 673319753),
    ("0123456789abcdefX", 90926404558651131L, -8171244916058444352L, 1282146043),
    ("20170107", -3929746374746999702L, -1685352003017003444L, 735278186),
    ("弹幕", 5413024244273921163L, 4954262442346275969L, -393855861),
    ("h_did_8827361", -5326696820569225613L, 8037328283037957643L, -1211840909),
    ("2017-04-16|pc|弹幕", -7161063957735147875L, -49114270032026518L, 2035807901))

  test("128-bit output matches the canonical murmur3 x64_128 spec") {
    vectors.foreach { case (s, h1, h2, _) =>
      assert(Murmur3.hashUnencodedChars(s) == ((h1, h2)), s"mismatch on '$s'")
    }
  }

  test("asInt = low 32 bits of h1 (guava HashCode.asInt contract)") {
    vectors.foreach { case (s, _, _, asInt) =>
      assert(Murmur3.hashStringAsInt(s) == asInt, s"mismatch on '$s'")
    }
  }

  test("reference sharding vector: (asInt & MaxInt) % 3 for \"20170107\"") {
    // ShardingTest.java:19-21 documents the sharding function shape
    assert(Murmur3.shardCode("20170107") == (735278186 & Int.MaxValue))
    assert(Murmur3.shardCode("20170107") % 3 == 2)
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
