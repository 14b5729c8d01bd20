package graft

import graft.functions.Kmv
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {

  import spark.implicits._

  private def users = Tables(spark, sf).events
    .select($"event_type", xxhash64($"user_id").as("h"))

  test("state is exactly the k smallest flipped hashes, any partitioning") {
    val k = 64
    def state(parts: Int) = users.repartition(parts)
      .agg(Kmv.kmv_agg($"h", k))
      .collect()(0).getSeq[Long](0)
    // reference: flip sign bit (signed order == unsigned raw order),
    // distinct, sort, take k — straight DataFrame arithmetic
    val expected = users
      .select(($"h".bitwiseXOR(Long.MinValue)).as("f"))
      .distinct().orderBy($"f").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(state(1) == expected)
    assert(state(13) == expected)
    assert(state(32) == expected)
  }

  test("small sets are held exactly and give exact jaccard") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("h")
    val b = Seq(3L, 4L, 5L).toDF("h")
    val sa = a.agg(Kmv.kmv_agg($"h", 64)).collect()(0).getSeq[Long](0).toSet
    val sb = b.agg(Kmv.kmv_agg($"h", 64)).collect()(0).getSeq[Long](0).toSet
    assert(sa.size == 4 && sb.size == 3)
    // both states are the full (flipped) sets -> intersection exact
    assert((sa intersect sb).size == 2)
  }

  test("purged states merge to the exact k smallest (200k distinct, 32 partitions)") {
    // enough distinct hashes that every partition's state purges many
    // times and the merge combines theta-bearing states
    val k = 64
    val df = spark.range(0, 200000, 1, 32)
      .select(xxhash64($"id").as("h"))
    val got = df.agg(Kmv.kmv_agg($"h", k))
      .collect()(0).getSeq[Long](0)
    val expected = df
      .select(($"h".bitwiseXOR(Long.MinValue)).as("f"))
      .distinct().orderBy($"f").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("pairwise jaccard estimates land in the hypergeometric envelope") {
    val k = 1024
    val sk = users.groupBy($"event_type").agg(Kmv.kmv_agg($"h", k).as("st"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val exact = Tables(spark, sf).events
      .select($"event_type", $"user_id").distinct()
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getLong(1)).toSet }
    val types = sk.keys.toSeq.sorted
    var checked = 0
    for { a <- types; b <- types if a < b } {
      val sa = sk(a).toSet
      val sb = sk(b).toSet
      val u = (sk(a) ++ sk(b)).distinct.sorted.take(k)
      val rho = u.count(v => sa(v) && sb(v))
      val est = rho.toDouble / u.size
      val ea = exact(a); val eb = exact(b)
      val j = (ea intersect eb).size.toDouble / (ea union eb).size
      assert(math.abs(est - j) <= 3.5 * 0.5 / math.sqrt(k.toDouble),
        s"($a,$b): est=$est exact=$j")
      checked += 1
    }
    assert(checked >= 3, "need several pairs for this spec to mean anything")
  }
}
