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
}
