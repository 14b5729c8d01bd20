package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  test("native fingerprint equals the declarative lambda form") {
    val docs = Tables(spark, sf).documents
    val rows = docs.select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("native"),
      TextFunctions.fingerprintDeclarative(col("text")).as("decl")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("fingerprint is order-sensitive") {
    import spark.implicits._
    val fp = Seq("a b", "b a").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(fp(0) != fp(1))
  }

  test("native expressions handle edge-case inputs") {
    import spark.implicits._
    import graft.functions.{Murmur3, ShingleHash64, SimHash64}
    val df = Seq("", "one", "one two", "one two three", "a a a a").toDF("t")
      .select(col("t"),
        ShingleHash64.shingle_hashes(col("t"), 3).as("sh"),
        SimHash64.simhash64(col("t")).as("sim"),
        TextFunctions.fingerprint(col("t")).as("fp"))
    val rows = df.collect()
    // fewer than n tokens → empty shingle set
    assert(rows(0).getSeq[Long](1).isEmpty)
    assert(rows(1).getSeq[Long](1).isEmpty)
    assert(rows(2).getSeq[Long](1).isEmpty)
    assert(rows(3).getSeq[Long](1) == Seq(Murmur3.hash64("one two three")))
    // repeated shingle deduplicates
    assert(rows(4).getSeq[Long](1) == Seq(Murmur3.hash64("a a a")))
    // empty text: fingerprint 0, simhash of one empty token is defined
    assert(rows(0).getLong(3) == 0L)
    // null propagates as null, not a crash
    val n = Seq[Option[String]](None).toDF("t")
      .select(ShingleHash64.shingle_hashes(col("t"), 3)).collect()(0)
    assert(n.isNullAt(0))
  }

  test("QDot handles length mismatch by truncating to the shorter side") {
    import spark.implicits._
    val r = Seq((Array(1L, 2L, 3L), Array(10L, 20L))).toDF("a", "b")
      .select(graft.functions.QDot.qdot(col("a"), col("b"))).collect()(0)
    assert(r.getLong(0) == 10L + 40L)
  }

  test("langid heuristic and quality metrics are deterministic and bounded") {
    val docs = Tables(spark, sf).documents
    val rows = docs.select(
      TextFunctions.langIdHeuristic(col("text")),
      TextFunctions.stopwordRatio(col("text")),
      TextFunctions.punctRatio(col("text"))).collect()
    rows.foreach { r =>
      assert(Set("en", "fr", "es", "de", "unk").contains(r.getString(0)))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("PII redaction masks emails, IPs, digit runs — and only those") {
    import spark.implicits._
    val cases = Seq(
      ("contact bob.smith+spam@example.co.uk for details",
        "contact <EMAIL> for details"),
      ("server at 192.168.001.1 and 10.0.0.255 responded",
        "server at <IP> and <IP> responded"),
      ("call 5551234567 ext 42", "call <NUM> ext 42"),
      ("a@b.io then 1.2.3.4 then 99999999", "<EMAIL> then <IP> then <NUM>"),
      // negatives: short digit runs, bare domains, version-ish dotted
      // numbers with <4 octets stay untouched
      ("version 1.2.3 build 123456 at example.com stays",
        "version 1.2.3 build 123456 at example.com stays"))
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.redactPii(col("t"))).collect().map(_.getString(0))
    got.zip(cases.map(_._2)).foreach { case (g, want) => assert(g == want) }
    val flags = cases.map(_._1).toDF("t")
      .select(TextFunctions.hasPii(col("t"))).collect().map(_.getBoolean(0))
    assert(flags.toSeq == Seq(true, true, true, true, false))
  }

  test("one-pass RepStats signals are bit-identical to the five-pass column formulas") {
    import graft.functions.TextFunctions.{maxMultiplicity, tokens, wordBigrams}
    import org.apache.spark.sql.DataFrame
    val spark0 = spark
    import spark0.implicits._
    // the PRE-r15 formula, verbatim — the contract RepStats replaces
    def oldForm(docs: DataFrame): DataFrame = {
      val toks = tokens(col("text"))
      val n = size(toks)
      docs.filter(size(tokens(col("text"))) >= 3)
        .select(col("doc_id"),
          (size(array_distinct(toks)).cast("double") / n).as("distinct_ratio"),
          (maxMultiplicity(toks).cast("double") / n).as("top_token_frac"),
          (maxMultiplicity(wordBigrams(toks)).cast("double") / (n - 1))
            .as("top_bigram_frac"),
          (lit(1.0) -
            size(graft.functions.ShingleHash64.shingle_hashes(col("text"), 3))
              .cast("double") / (n - 2)).as("dup_trigram_frac"))
    }
    // corpus docs + adversarial edges: repeats, trailing/double spaces
    // (empty tokens count), short docs straddling the n >= 3 filter
    val edges = Seq(
      (100001L, "a a a a a"), (100002L, "x y x y x y"),
      (100003L, "a b"), (100004L, "ab"), (100005L, "a b c"),
      (100006L, "a  b  c"), (100007L, "a b c "), (100008L, " a b"),
      (100009L, "w w w"), (100010L, "the the the the"))
      .toDF("doc_id", "text")
    val docs = Tables(spark, sf).documents.select($"doc_id", $"text")
      .union(edges)
    def rows(df: DataFrame) = df.collect().map(r => (r.getLong(0),
      r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val now = rows(graft.operators.IngestDashboard.repSignals(docs, "doc_id", "text"))
    val want = rows(oldForm(docs))
    assert(want.nonEmpty && now == want,
      s"missing=${(want -- now).take(3)} extra=${(now -- want).take(3)}")
  }
}
