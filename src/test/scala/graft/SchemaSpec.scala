package graft

import org.apache.spark.sql.types._

/** Pins the expected schema of every harness testdata table, so the
  * next silent testdata regeneration fails HERE, in one named place,
  * instead of as 20 scattered analysis errors (round 10: the driver
  * re-encoded events.ts from TIMESTAMP(NANOS) to timestamp[us] and 23
  * query gates + 20 tests + the whole bench artifact went red with no
  * message pointing at the file that changed).
  *
  * Timestamp columns tolerate the encodings seen across generations
  * (INT64-nanos-as-long / TIMESTAMP_NTZ / TIMESTAMP); everything else
  * is exact. A failure names the table file and the drifted field.
  */
class SchemaSpec extends SparkSpec {

  /** Acceptable Spark-read types for a ts-encoded column. */
  private val tsEncodings: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  // (field -> exact type), with None marking a timestamp-encoded field
  private val expected: Map[String, Seq[(String, Option[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Some(IntegerType), "r_name" -> Some(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Some(IntegerType), "n_name" -> Some(StringType),
      "n_regionkey" -> Some(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Some(LongType), "c_name" -> Some(StringType),
      "c_nationkey" -> Some(IntegerType), "c_acctbal" -> Some(DoubleType),
      "c_mktsegment" -> Some(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Some(LongType), "s_name" -> Some(StringType),
      "s_nationkey" -> Some(IntegerType), "s_acctbal" -> Some(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Some(LongType), "p_name" -> Some(StringType),
      "p_brand" -> Some(StringType), "p_type" -> Some(StringType),
      "p_size" -> Some(IntegerType), "p_retailprice" -> Some(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Some(LongType), "o_custkey" -> Some(LongType),
      "o_orderstatus" -> Some(StringType), "o_totalprice" -> Some(DoubleType),
      "o_orderdate" -> None, "o_orderpriority" -> Some(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Some(LongType), "l_partkey" -> Some(LongType),
      "l_suppkey" -> Some(LongType), "l_linenumber" -> Some(IntegerType),
      "l_quantity" -> Some(DoubleType), "l_extendedprice" -> Some(DoubleType),
      "l_discount" -> Some(DoubleType), "l_tax" -> Some(DoubleType),
      "l_returnflag" -> Some(StringType), "l_linestatus" -> Some(StringType),
      "l_shipdate" -> None),
    "events" -> Seq(
      "event_id" -> Some(LongType), "ts" -> None,
      "user_id" -> Some(LongType), "event_type" -> Some(StringType),
      "value" -> Some(DoubleType), "props" -> Some(StringType)),
    "documents" -> Seq(
      "doc_id" -> Some(LongType), "text" -> Some(StringType),
      "lang" -> Some(StringType), "source" -> Some(StringType),
      "n_chars" -> Some(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Some(LongType),
      "embedding" -> Some(ArrayType(FloatType, containsNull = true)),
      "label" -> Some(IntegerType)))

  test("every testdata table matches its pinned schema (raw parquet read)") {
    // nanosAsLong so a TIMESTAMP(NANOS) generation still reads (as long)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // all three harness SFs: the round-10 regen drifted ALL of them at
    // once, but nothing guarantees a future regen stays uniform
    val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)
    val drift = sfDirs.flatMap { dir =>
      Tables.names.flatMap { t =>
        val file = s"$dir/$t.parquet"
        val actual = spark.read.parquet(file).schema
        val exp = expected(t)
        if (actual.fields.map(_.name).toSeq != exp.map(_._1))
          Seq(s"$file: fields ${actual.fields.map(_.name).mkString(",")} " +
            s"!= pinned ${exp.map(_._1).mkString(",")}")
        else exp.flatMap {
          case (name, Some(tpe)) if actual(name).dataType != tpe =>
            Some(s"$file: $name is ${actual(name).dataType.simpleString}, pinned ${tpe.simpleString}")
          case (name, None) if !tsEncodings.contains(actual(name).dataType) =>
            Some(s"$file: $name is ${actual(name).dataType.simpleString}, " +
              "not a known ts encoding (bigint / timestamp_ntz / timestamp)")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty, s"\nTESTDATA SCHEMA DRIFT:\n${drift.mkString("\n")}")
  }

  test("Tables accessors surface normalized types regardless of encoding") {
    val t = Tables(spark, sf)
    // whatever the file encodes, consumers must always see TIMESTAMP
    assert(t.events.schema("ts").dataType == TimestampType,
      "Tables.events must normalize ts to TimestampType")
    // and the full registry must be constructible + countable
    t.frames.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name: empty table")
    }
  }

  test("schema drift in a corrupted copy is named by table and field") {
    // deliberately corrupt one table in a temp dir: the check must fail
    // naming that file, proving the next real regen gets a 1-line diagnosis
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-schema").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val actual = spark.read.parquet(s"$tmp/documents.parquet").schema
    val exp = expected("documents")
    val drift = exp.collect {
      case (name, Some(tpe)) if actual(name).dataType != tpe =>
        s"$tmp/documents.parquet: $name is ${actual(name).dataType.simpleString}, pinned ${tpe.simpleString}"
    }
    assert(drift.exists(_.contains("n_chars is int, pinned bigint")))
  }
}
