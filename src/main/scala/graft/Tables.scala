package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the harness parquet layout (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory.
  *
  * Mirrors the reference's external-schema stance (SURVEY.md §1.3 —
  * schema comes from the catalog, not inference): parquet footers are
  * the catalog here, so every read is schema-exact and column-pruned
  * by Catalyst.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read the raw INT64 nanos and convert to micros
    * (integer DIV — a double division would lose precision above 2^53).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Every table through its typed accessor (events gets its nanos
    * conversion — never read it via raw `table()`).
    */
  def frames: Seq[(String, DataFrame)] = Seq(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Register every table as a temp view so `spark.sql` works over the
    * same names the DuckDB oracle uses.
    */
  def registerAll(): Unit =
    frames.foreach { case (n, df) => df.createOrReplaceTempView(n) }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
