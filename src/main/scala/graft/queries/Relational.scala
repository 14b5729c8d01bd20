package graft.queries

import graft.{Parity, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational surface the reference delegates to ClickHouse as SQL
  * strings (SURVEY.md §2.B) plus the standard relational operators the
  * engine must run natively: scans with pushdown, joins (broadcast /
  * shuffle / semi / anti), aggregation (plain, rollup, distinct,
  * conditional, array-agg), windows, sorts/top-k, set ops, string and
  * date functions.
  *
  * Every query is paired with an ANSI-SQL oracle (DuckDB) in
  * [[oracles]]; results are deterministically ordered and use exact
  * decimal arithmetic (see [[graft.Parity]]) so they hash-match the
  * oracle regardless of partitioning / aggregation order — which is
  * what makes the same plans correct on a 1000-executor cluster.
  * q161 (least squares / correlation) deliberately avoids the
  * built-in corr/regr aggregates: their incremental co-moment updates
  * are partitioning-dependent floats, so the gate computes EXACT
  * integer sums (n, Σx, Σy, Σxy, Σx², Σy² in cents) and derives
  * slope/intercept/r² with one fixed double formula both engines
  * evaluate identically on identical integers.
  */
object Relational {
  import Parity._

  type Q = (SparkSession, String) => DataFrame

  /** Weighted median over a (key, v, w) frame — smallest v whose
    * cumulative w reaches half the key's total — WITHOUT a cumulative
    * window keyed by the low-cardinality `key` alone (3 distinct
    * values here: each key's whole sort would serialize on one task
    * at 100× data — the SCALE.md low-key-cardinality sweep hazard,
    * fixed the same way as the q153/q154 interval sweeps).
    *
    * Shape: range-split the VALUE domain into `buckets` slices,
    * prefix-sum within (key, bucket) — parallelism keys·buckets —
    * and seed each bucket with a carry = Σ of all lower buckets'
    * weights, computed by a window over the BOUNDED keys·buckets-row
    * per-bucket frame. carry + within-bucket prefix IS the global
    * prefix exactly: buckets are value-ordered and (key, v) rows are
    * unique, so no cumulative term crosses a bucket boundary.
    * RelationalSpec pins output identity against the plain
    * single-window form.
    */
  private[graft] def weightedMedianRanged(byVal: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val b = byVal.sparkSession
    import b.implicits._
    // bounded driver metadata: the value domain's [lo, hi] span
    val Array(row) = byVal.agg(min($"v").cast("double").as("lo"),
      max($"v").cast("double").as("hi")).collect()
    if (row.isNullAt(0)) // empty input: keep the output schema
      return byVal.select(col(key), $"v".cast("double").as("wmedian")).limit(0)
    val lo = row.getDouble(0)
    val span = math.max(row.getDouble(1) - lo, 1e-9)
    val bucketed = byVal.withColumn("b",
      least(lit(buckets - 1), greatest(lit(0),
        floor(($"v".cast("double") - lo) / span * buckets).cast("int"))))
    val perBucket = bucketed.groupBy(col(key), $"b").agg(sum($"w").as("bw"))
    val carryWin = Window.partitionBy(col(key)).orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = perBucket
      .withColumn("carry", sum($"bw").over(carryWin))
      .select(col(key), $"b", coalesce($"carry", lit(0)).as("carry"))
    val totals = perBucket.groupBy(col(key)).agg(sum($"bw").as("tw"))
    val win = Window.partitionBy(col(key), $"b").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("pcum", sum($"w").over(win))
      .join(broadcast(carries), Seq(key, "b"))
      .join(broadcast(totals), key)
      .filter(($"pcum" + $"carry") * 2 >= $"tw")
      .groupBy(col(key))
      .agg(min($"v").cast("double").as("wmedian"))
  }

  val queries: Map[String, Q] = Map(
    // simpleLinearRegression / corr analogue (see the scaladoc note on
    // determinism): least-squares y = kx + b of extendedprice-cents on
    // quantity per returnflag, plus Pearson r² — exact integer sums,
    // one fixed double formula. One partial-aggregated shuffle.
    "q161_linear_regression" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem.select(
        $"l_returnflag",
        $"l_quantity".cast("long").as("x"),
        round($"l_extendedprice" * 100).cast("long").as("y"))
      // all sums and co-moment PRODUCTS in decimal(38,0) — Σy² and
      // n·Σxy overflow a long well before 100 TB; the doubles appear
      // only at the final division (same single rounding both engines)
      def d38(c: Column) = c.cast("decimal(38,0)")
      li.groupBy($"l_returnflag")
        .agg(d38(count(lit(1))).as("n"), d38(sum($"x")).as("sx"),
          d38(sum($"y")).as("sy"),
          sum(d38($"x" * $"y")).as("sxy"),
          sum(d38($"x" * $"x")).as("sxx"),
          sum(d38($"y" * $"y")).as("syy"))
        .select($"l_returnflag", $"n".cast("long").as("n"),
          ($"n" * $"sxy" - $"sx" * $"sy").cast("double").as("num"),
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double").as("den"),
          ($"n" * $"syy" - $"sy" * $"sy").cast("double").as("deny"),
          $"sx".cast("double").as("dx"), $"sy".cast("double").as("dy"),
          $"n".cast("double").as("dn"))
        .select($"l_returnflag", $"n",
          ($"num" / $"den").as("slope"),
          (($"dy" - $"num" / $"den" * $"dx") / $"dn").as("intercept"),
          ($"num" * $"num" / ($"den" * $"deny")).as("r2"))
        .orderBy($"l_returnflag")
    },

    // TPC-H Q1-style pricing summary. Group-by agg with partial
    // (map-side) aggregation; decimal sums are associative so the
    // 2-phase agg is exact at any parallelism.
    "q01_agg_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sumD($"l_quantity").as("sum_qty"),
          sumD($"l_extendedprice").as("sum_base_price"),
          sumRevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Filter + projection; predicates and the 4-column ReadSchema are
    // pushed into the parquet scan (verified via .explain in the spec).
    "q02_filter_projection_pushdown" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_returnflag" === "R" && $"l_quantity" >= 30 &&
          $"l_shipdate" > lit("1996-01-01 00:00:00").cast("timestamp"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
        .limit(100)
    },

    // 4-way join: fact-to-fact shuffle join (lineitem⋈orders) + small
    // dims broadcast — the shape that survives a 100× scale-up.
    "q03_join_revenue_by_nation" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t.customer), $"o_custkey" === $"c_custkey")
        .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          sumRevenue($"l_extendedprice", $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },

    // Five-way star join (TPC-H Q5 shape): region+nation+customer
    // broadcast as dims, orders⋈lineitem shuffles as facts — every
    // harness table's lineage in one plan.
    "q72_revenue_by_region" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t.customer), $"o_custkey" === $"c_custkey")
        .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          sumRevenue($"l_extendedprice", $"l_discount").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name")
    },

    // groupArray analogue (reference emits `groupArray(host_address)`
    // over system.clusters — ClickhouseClient.java:124). Sorted +
    // joined to a string so the hash is order-insensitive.
    "q04_group_array" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).nation
        .groupBy($"n_regionkey")
        .agg(
          array_join(sort_array(collect_list($"n_name")), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(desc("n_regionkey"))
    },

    // ORDER BY … DESC + LIMIT (top-k). Spark plans TakeOrderedAndProject:
    // per-partition heap + driver merge, no full sort at scale.
    "q05_topk" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).customer
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy(desc("c_acctbal"), $"c_custkey")
        .limit(10)
    },

    // LIKE prefix, regex match, string range predicate, concat — the
    // string predicates of SURVEY §2.B (ClickhouseHdfsLoader.java:497,
    // OldDailyMergeTask.java:86,113 `name > '…'`).
    "q06_string_predicates" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).part
        .filter(($"p_name".like("b%") || $"p_name".rlike("ring$")) &&
          $"p_name" > "a" && $"p_name" <= "z")
        .select($"p_partkey", concat($"p_brand", lit("."), $"p_name").as("brand_name"), $"p_name")
        .orderBy($"p_partkey")
    },

    "q07_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderstatus", $"o_orderpriority")
        .distinct()
        .orderBy($"o_orderstatus", $"o_orderpriority")
    },

    // INSERT INTO target SELECT * FROM temp (reference's 2-phase merge,
    // ClickhouseLoaderReducer.java:224) = UNION ALL append semantics.
    "q08_insert_select_union" -> { (s, dir) =>
      import s.implicits._
      val o = Tables(s, dir).orders
      o.filter($"o_orderstatus" === "O")
        .unionByName(o.filter($"o_orderstatus" === "F"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), sumD($"o_totalprice").as("total"))
        .orderBy($"o_orderstatus")
    },

    // Window functions: row_number + running sum with an explicit ROWS
    // frame over a unique ordering (deterministic across engines).
    "q09_window_running" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).lineitem
        .filter($"l_suppkey" <= 5)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running_qty", sum(dec2($"l_quantity")).over(wf).cast("double"))
        .filter($"rn" <= 50)
        .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber", $"running_qty")
        .orderBy($"l_suppkey", $"rn")
    },

    // Scalar count(*) with alias — the reference's column-arity probe
    // (AbstractClickhouseLoaderMapper.java:490).
    "q10_scalar_count" -> { (s, dir) =>
      Tables(s, dir).lineitem.agg(count(lit(1)).as("total_col_size"))
    },

    // EXISTS → left-semi join (never materializes the right side).
    "q11_semi_join_exists" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter($"o_orderpriority" === "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },

    // NOT EXISTS → left-anti join (customers with no low-priority order).
    "q12_anti_join_not_exists" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.filter($"o_orderpriority" === "5-LOW"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },

    // INTERSECT / EXCEPT (distinct set semantics in both engines).
    "q13_setops_intersect_except" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val withOrders = t.orders.select($"o_custkey".as("custkey"))
      val rich = t.customer.filter($"c_acctbal" > 5000).select($"c_custkey".as("custkey"))
      rich.intersect(withOrders).withColumn("op", lit("intersect"))
        .unionByName(rich.except(withOrders).withColumn("op", lit("except")))
        .orderBy($"op", $"custkey")
    },

    // ROLLUP with coalesced grouping keys (avoids NULL-ordering
    // divergence between engines).
    "q14_rollup_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sumD($"l_quantity").as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n", $"qty")
        .orderBy($"returnflag", $"linestatus")
    },

    // CUBE completes the grouping-set family (rollup: q14): all four
    // grouping combinations in one pass, marked via coalesce sentinels.
    "q73_cube_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sumD($"l_quantity").as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n", $"qty")
        .orderBy($"returnflag", $"linestatus")
    },

    // Explicit GROUPING SETS (the general form rollup/cube q14/q73
    // specialize): per-flag totals, per-status totals, and the full
    // cross — one pass, Spark expands to a single Expand + partial agg.
    "q82_grouping_sets" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus"),
            Seq($"l_returnflag", $"l_linestatus")),
          $"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sumD($"l_quantity").as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n", $"qty")
        .orderBy($"returnflag", $"linestatus")
    },

    // Date arithmetic: year/month extraction, month truncation, dt-30d
    // (the reference does `dt - dailyExpires days` in Java Calendar —
    // OldDailyMergeTask.java:70-74).
    "q15_date_arith" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .groupBy(
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          date_trunc("month", $"o_orderdate").cast("date").as("month_start"))
        .agg(
          count(lit(1)).as("n"),
          min(date_sub($"o_orderdate".cast("date"), 30)).as("min_minus30"))
        .orderBy($"y", $"m")
    },

    "q16_count_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey").as("n_parts"))
        .orderBy($"l_returnflag")
    },

    // Conditional aggregation (CASE WHEN inside agg).
    "q17_conditional_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .groupBy($"o_orderpriority")
        .agg(
          sum(when($"o_orderstatus" === "F", dec2($"o_totalprice"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("f_total"),
          count(when($"o_orderstatus" === "O", lit(1))).as("n_open"))
        .orderBy($"o_orderpriority")
    },

    // HAVING (post-aggregation filter).
    "q18_having" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).part
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"))
        .filter($"n" >= 5)
        .orderBy($"p_brand")
    },

    // Correlated-scalar-subquery semantics (customers above their
    // segment's average) — decorrelated into a window; exact decimal
    // average so the comparison is order-independent.
    "q19_above_segment_avg" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment")
      Tables(s, dir).customer
        .withColumn("seg_avg",
          sum(dec2($"c_acctbal")).over(w).cast("double") / count(lit(1)).over(w))
        .filter($"c_acctbal" > $"seg_avg")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    },

    // Lateral explode / unnest: global token frequencies, top 50.
    "q45_token_frequencies" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select(explode(split($"text", " ")).as("t"))
        .groupBy($"t").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), $"t")
        .limit(50)
    },

    // Extended window functions: rank/dense_rank/ntile/lag/lead +
    // exact percentiles per group.
    "q46_window_suite" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
      Tables(s, dir).customer
        .filter($"c_custkey" < 200)
        .select($"c_custkey", $"c_mktsegment",
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag($"c_acctbal", 1).over(w).as("prev_bal"),
          lead($"c_acctbal", 1).over(w).as("next_bal"))
        .orderBy($"c_custkey")
    },

    // Range (interval) join via bin-bucketized equi-join
    // (graft.operators.RangeJoin): parts matched into size bands;
    // oracled by DuckDB's non-equi join.
    // Salted-join skew mitigation gate: the big side's key is sprayed
    // across 8 salts, the small side replicated ×8, and the oracle
    // runs the UNSALTED plain join — the result must be identical
    // (that is the whole point of salting).
    "q68_salted_join" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
        .select($"l_partkey".as("partkey"), $"l_quantity")
      val p = Tables(s, dir).part.select($"p_partkey".as("partkey"), $"p_brand")
      graft.operators.Skew.saltedJoin(li, p, "partkey", saltFactor = 8)
        .groupBy($"p_brand")
        .agg(Parity.sumD($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"p_brand")
    },

    "q54_range_join" -> { (s, dir) =>
      import s.implicits._
      val bands = s.createDataFrame(Seq(
        ("tiny", 0L, 9L), ("small", 10L, 24L), ("mid", 25L, 39L), ("big", 40L, 100L)))
        .toDF("band", "lo", "hi")
      graft.operators.RangeJoin.byBinning(
          Tables(s, dir).part.select($"p_partkey", $"p_size".cast("long").as("p_size")),
          bands, "p_size", "lo", "hi", binWidth = 10L)
        .groupBy($"band").agg(count(lit(1)).as("n"), min($"p_size").as("min_size"),
          max($"p_size").as("max_size"))
        .orderBy($"band")
    },

    // Exact interpolated percentiles per group (rounded to 6dp — the
    // interpolation formulas of different engines may differ in the
    // final ulp).
    "q55_percentiles" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"))
        .orderBy($"l_returnflag")
    },

    // FULL OUTER join completeness gate: BUILDING-segment customers
    // against per-customer order rollups — unmatched rows survive on
    // BOTH sides (customers with no orders; orders whose customer is
    // outside the dim slice), sentinel-coalesced for a stable compare.
    "q113_full_outer_join" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val od = t.orders.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          graft.Parity.sumD($"o_totalprice").as("total"))
      val dim = t.customer.filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_name")
      dim.join(od, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
          coalesce($"c_name", lit("<none>")).as("c_name"),
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"total", lit(0.0)).as("total"))
        .orderBy($"custkey")
    },

    // quantileExactWeighted-style weighted median (ClickHouse dialect
    // kinship): smallest price whose cumulative quantity-weight
    // reaches half the group total. Exact DECIMAL cumulative sums;
    // the half-total test is `cum·2 >= total` (no decimal division),
    // so both engines agree bit-for-bit.
    "q110_weighted_median" -> { (s, dir) =>
      import s.implicits._
      val byVal = Tables(s, dir).lineitem
        .groupBy($"l_returnflag", graft.Parity.dec2($"l_extendedprice").as("v"))
        .agg(sum(graft.Parity.dec2($"l_quantity")).as("w"))
      // range-partitioned cumulative path (see weightedMedianRanged):
      // no window keyed by the 3-value flag alone survives the plan
      weightedMedianRanged(byVal, "l_returnflag", buckets = 32)
        .orderBy($"l_returnflag")
    },

    // varSamp/stddevSamp from exact decimal moments: Σx and Σx² are
    // order-free DECIMAL sums (the Parity.sumD pattern extended to
    // second moments), combined in a FIXED double expression tree —
    // n·Σx² − (Σx)² over n(n−1), then one sqrt — so the result is
    // bit-identical across engines and shuffle schedules, unlike
    // native float stddev.
    "q111_exact_moments" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(graft.Parity.dec2($"l_quantity")).as("sx"),
          sum(graft.Parity.dec2($"l_quantity") * graft.Parity.dec2($"l_quantity")).as("sx2"))
        .select($"l_returnflag", $"n",
          (($"n".cast("double") * $"sx2".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")) /
            ($"n" * ($"n" - 1)).cast("double")).as("var_samp"))
        .withColumn("stddev_samp", sqrt($"var_samp"))
        .orderBy($"l_returnflag")
    },

    // Calendar generation + gap-filling: a generated month dimension
    // left-joined to order counts — months with no orders surface as
    // zeros instead of silently missing (sequence/explode = the
    // generate_series pattern).
    "q63_calendar_gapfill" -> { (s, dir) =>
      import s.implicits._
      val months = s.range(1).select(explode(sequence(
          lit(java.sql.Date.valueOf("1995-01-01")),
          lit(java.sql.Date.valueOf("2001-12-01")),
          expr("INTERVAL 1 MONTH"))).as("month_start"))
      val counts = Tables(s, dir).orders
        .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month_start"))
        .agg(count(lit(1)).as("n_orders"))
      months.join(counts, Seq("month_start"), "left")
        .select($"month_start", coalesce($"n_orders", lit(0L)).as("n_orders"))
        .orderBy($"month_start")
    },

    // String + conditional scalar function suite.
    "q60_string_functions" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).customer
        .filter($"c_custkey" < 100)
        .select(
          $"c_custkey",
          upper($"c_mktsegment").as("seg_upper"),
          lower($"c_name").as("name_lower"),
          trim(concat(lit("  "), $"c_name", lit("  "))).as("trimmed"),
          substring($"c_name", 1, 8).as("name_prefix"),
          instr($"c_name", "#").cast("long").as("hash_pos"),
          reverse($"c_name").as("name_rev"),
          repeat($"c_mktsegment", 2).as("seg_twice"),
          lpad($"c_custkey".cast("string"), 6, "0").as("key_padded"),
          coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("__building__")).as("seg_nn"),
          greatest($"c_acctbal", lit(0.0)).as("bal_floor"),
          least($"c_acctbal", lit(5000.0)).as("bal_cap"))
        .orderBy($"c_custkey")
    },

    // Math function suite (transcendentals rounded: Spark's
    // java.lang.Math and the oracle's libm may differ in the last ulp).
    "q61_math_functions" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_orderkey" < 50)
        .select(
          $"l_orderkey", $"l_linenumber",
          abs($"l_discount" - 0.05).as("abs_v"),
          ceil($"l_extendedprice").cast("long").as("ceil_v"),
          floor($"l_extendedprice").cast("long").as("floor_v"),
          sqrt($"l_quantity").as("sqrt_v"),
          round(pow($"l_quantity", 2), 6).as("pow2_v"),
          round(log($"l_extendedprice"), 6).as("ln_v"),
          round(exp($"l_discount"), 6).as("exp_v"),
          pmod($"l_orderkey", lit(7)).cast("long").as("mod_v"),
          sign($"l_discount" - 0.05).as("sign_v"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // The SQL text surface: spark.sql over registered views with a
    // CTE + join + window — the way the reference's consumers write
    // queries.
    "q62_sql_surface" -> { (s, dir) =>
      Tables(s, dir).registerAll()
      s.sql(
        """WITH revenue AS (
          |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |  FROM orders GROUP BY o_custkey),
          |ranked AS (
          |  SELECT c_mktsegment, c_custkey, total,
          |    CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY total DESC, c_custkey) AS BIGINT) AS rnk
          |  FROM customer JOIN revenue ON c_custkey = o_custkey)
          |SELECT c_mktsegment, c_custkey, total, rnk
          |FROM ranked WHERE rnk <= 3
          |ORDER BY c_mktsegment, rnk""".stripMargin)
    },

    // Multiset set ops: EXCEPT ALL / INTERSECT ALL (duplicate-
    // preserving, unlike q13's distinct set semantics).
    "q57_setops_all" -> { (s, dir) =>
      import s.implicits._
      val o = Tables(s, dir).orders
      val low = o.filter($"o_orderpriority" === "5-LOW").select($"o_custkey".as("custkey"))
      val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey".as("custkey"))
      low.exceptAll(urgent).withColumn("op", lit("except_all"))
        .unionByName(low.intersectAll(urgent).withColumn("op", lit("intersect_all")))
        .groupBy($"op", $"custkey").agg(count(lit(1)).as("n"))
        .orderBy($"op", $"custkey")
    },

    // UNPIVOT / melt: wide metric columns to (metric, value) rows.
    "q58_unpivot" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_orderkey" < 100)
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_discount", $"l_tax"),
          "metric", "value")
        .orderBy($"l_orderkey", $"l_linenumber", $"metric")
    },

    // Pivot (wide conditional aggregation) with exact decimal sums.
    "q53_pivot" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sumD($"o_totalprice"))
        .na.fill(0.0, Seq("F", "O", "P"))
        .orderBy($"o_orderpriority")
    },

    // As-of join (composed operator — graft.operators.AsOfJoin): each
    // click picks up the user's most recent prior purchase value;
    // oracled by DuckDB's native ASOF JOIN.
    "q47_asof_join" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", $"user_id", unix_millis($"ts").as("tms"),
          $"event_type", $"value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"tms")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"tms", $"value".as("purchase_value"))
      graft.operators.AsOfJoin.asOfInner(clicks, purchases, "user_id", "tms",
          Seq("purchase_value"))
        .orderBy($"event_id")
    })

  val oracles: Map[String, String] = Map(
    "q161_linear_regression" ->
      """WITH a AS (SELECT l_returnflag,
        |  CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
        |  CAST(sum(CAST(l_quantity AS BIGINT)
        |    * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sxy,
        |  CAST(sum(CAST(l_quantity AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sxx,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE)
        |    - CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS intercept,
        |  CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |       * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
        |FROM a
        |ORDER BY l_returnflag""".stripMargin,
    "q01_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_projection_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30
        |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q03_join_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q72_revenue_by_region" ->
      """SELECT r_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,

    "q04_group_array" ->
      """SELECT n_regionkey,
        | string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | count(*) AS n
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey DESC""".stripMargin,

    "q05_topk" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |ORDER BY c_acctbal DESC, c_custkey
        |LIMIT 10""".stripMargin,

    "q06_string_predicates" ->
      """SELECT p_partkey, p_brand || '.' || p_name AS brand_name, p_name
        |FROM part
        |WHERE (p_name LIKE 'b%' OR regexp_matches(p_name, 'ring$'))
        |  AND p_name > 'a' AND p_name <= 'z'
        |ORDER BY p_partkey""".stripMargin,

    "q07_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority
        |FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q08_insert_select_union" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT * FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderstatus = 'F'
        |)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q09_window_running" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    row_number() OVER w AS rn,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |      PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |  FROM lineitem WHERE l_suppkey <= 5
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |)
        |WHERE rn <= 50
        |ORDER BY l_suppkey, rn""".stripMargin,

    "q10_scalar_count" ->
      "SELECT count(*) AS total_col_size FROM lineitem",

    "q11_semi_join_exists" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q12_anti_join_not_exists" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '5-LOW')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q13_setops_intersect_except" ->
      """SELECT custkey, 'intersect' AS op FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |  INTERSECT
        |  SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT custkey, 'except' AS op FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |  EXCEPT
        |  SELECT o_custkey FROM orders)
        |ORDER BY op, custkey""".stripMargin,

    "q14_rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q73_cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q82_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q15_date_arith" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | count(*) AS n,
        | min(CAST(o_orderdate AS DATE) - 30) AS min_minus30
        |FROM orders
        |GROUP BY 1, 2, 3
        |ORDER BY y, m""".stripMargin,

    "q16_count_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q17_conditional_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q18_having" ->
      """SELECT p_brand, count(*) AS n
        |FROM part
        |GROUP BY p_brand
        |HAVING count(*) >= 5
        |ORDER BY p_brand""".stripMargin,

    "q19_above_segment_avg" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM customer c2 WHERE c2.c_mktsegment = c.c_mktsegment)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q45_token_frequencies" ->
      """SELECT t, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |GROUP BY t
        |ORDER BY n DESC, t
        |LIMIT 50""".stripMargin,

    "q46_window_suite" ->
      """SELECT c_custkey, c_mktsegment,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | lag(c_acctbal, 1) OVER w AS prev_bal,
        | lead(c_acctbal, 1) OVER w AS next_bal
        |FROM customer
        |WHERE c_custkey < 200
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q68_salted_join" ->
      """SELECT p_brand,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q54_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('tiny', 0, 9), ('small', 10, 24), ('mid', 25, 39), ('big', 40, 100))
        |SELECT band, count(*) AS n,
        |  CAST(min(p_size) AS BIGINT) AS min_size,
        |  CAST(max(p_size) AS BIGINT) AS max_size
        |FROM part JOIN bands ON p_size >= lo AND p_size <= hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    "q55_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        | round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q113_full_outer_join" ->
      """WITH od AS (SELECT o_custkey, count(*) AS n_orders,
        |              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |            FROM orders GROUP BY 1),
        |dim AS (SELECT c_custkey, c_name FROM customer
        |        WHERE c_mktsegment = 'BUILDING')
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  coalesce(c_name, '<none>') AS c_name,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(total, 0.0) AS total
        |FROM dim FULL OUTER JOIN od ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q110_weighted_median" ->
      """WITH bv AS (SELECT l_returnflag,
        |              CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |              sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
        |            FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v,
        |        sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(w) OVER (PARTITION BY l_returnflag) AS tw
        |      FROM bv)
        |SELECT l_returnflag, CAST(min(v) AS DOUBLE) AS wmedian
        |FROM c WHERE cum * 2 >= tw
        |GROUP BY 1
        |ORDER BY l_returnflag""".stripMargin,

    "q111_exact_moments" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |             sum(CAST(l_quantity AS DECIMAL(18,2))
        |               * CAST(l_quantity AS DECIMAL(18,2))) AS sx2
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / CAST(n * (n - 1) AS DOUBLE) AS var_samp,
        |  sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / CAST(n * (n - 1) AS DOUBLE)) AS stddev_samp
        |FROM m
        |ORDER BY l_returnflag""".stripMargin,

    "q63_calendar_gapfill" ->
      """WITH months AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-12-01',
        |    INTERVAL 1 MONTH)) AS DATE) AS month_start),
        |counts AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT m.month_start, coalesce(c.n_orders, 0) AS n_orders
        |FROM months m LEFT JOIN counts c ON m.month_start = c.month_start
        |ORDER BY m.month_start""".stripMargin,

    "q60_string_functions" ->
      """SELECT c_custkey,
        | upper(c_mktsegment) AS seg_upper,
        | lower(c_name) AS name_lower,
        | trim('  ' || c_name || '  ') AS trimmed,
        | substr(c_name, 1, 8) AS name_prefix,
        | CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        | reverse(c_name) AS name_rev,
        | repeat(c_mktsegment, 2) AS seg_twice,
        | lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS key_padded,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '__building__') AS seg_nn,
        | greatest(c_acctbal, 0.0) AS bal_floor,
        | least(c_acctbal, 5000.0) AS bal_cap
        |FROM customer
        |WHERE c_custkey < 100
        |ORDER BY c_custkey""".stripMargin,

    "q61_math_functions" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS abs_v,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_v,
        | CAST(floor(l_extendedprice) AS BIGINT) AS floor_v,
        | sqrt(l_quantity) AS sqrt_v,
        | round(pow(l_quantity, 2), 6) AS pow2_v,
        | round(ln(l_extendedprice), 6) AS ln_v,
        | round(exp(l_discount), 6) AS exp_v,
        | CAST(l_orderkey % 7 AS BIGINT) AS mod_v,
        | CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_v
        |FROM lineitem
        |WHERE l_orderkey < 50
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q62_sql_surface" ->
      """WITH revenue AS (
        |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT c_mktsegment, c_custkey, total,
        |    CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY total DESC, c_custkey) AS BIGINT) AS rnk
        |  FROM customer JOIN revenue ON c_custkey = o_custkey)
        |SELECT c_mktsegment, c_custkey, total, rnk
        |FROM ranked WHERE rnk <= 3
        |ORDER BY c_mktsegment, rnk""".stripMargin,

    "q57_setops_all" ->
      """WITH low AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'),
        |urgent AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |ea AS (SELECT custkey FROM low EXCEPT ALL SELECT custkey FROM urgent),
        |ia AS (SELECT custkey FROM low INTERSECT ALL SELECT custkey FROM urgent)
        |SELECT op, custkey, count(*) AS n FROM (
        |  SELECT 'except_all' AS op, custkey FROM ea
        |  UNION ALL
        |  SELECT 'intersect_all' AS op, custkey FROM ia)
        |GROUP BY op, custkey
        |ORDER BY op, custkey""".stripMargin,

    "q58_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        |  FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey < 100)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q53_pivot" ->
      """SELECT o_orderpriority,
        | coalesce(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS "F",
        | coalesce(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS "O",
        | coalesce(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS "P"
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q47_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, event_type, value FROM events),
        |clicks AS (SELECT event_id, user_id, tms FROM ev WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, tms, value AS purchase_value FROM ev WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.tms, p.purchase_value
        |FROM clicks c ASOF JOIN purchases p
        |  ON c.user_id = p.user_id AND c.tms >= p.tms
        |ORDER BY c.event_id""".stripMargin)
}
