package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

/** Join-family / set-operation / grouping-set coverage (SURVEY §2.4, §2.8,
  * §2.13 "absent" families — implemented so a reference user gains them).
  *
  * Scale notes per query are inline; the common rules:
  *   - dimension sides of joins are `broadcast()` (nation/region: O(10)–O(100)
  *     rows at any SF — never shuffle the fact side for them);
  *   - the as-of join is the union+window formulation: ONE shuffle on the
  *     partition key instead of a per-row backward probe (the naive
  *     correlated form is O(n·m) and unusable at 100 TB);
  *   - the range join is rewritten as an equi-join on a computed bucket key —
  *     a broadcast-nested-loop range join would not survive scale-up.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Set operations: UNION (distinct), INTERSECT, EXCEPT on key sets.
    // Each set op shuffles on the full row as key; inputs are pre-projected
    // to the single join column so the exchange carries minimum bytes.
    "s1_setops" -> ((s, d) => {
      val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val rich = customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      val u = building.union(rich).distinct().withColumn("op", lit("union"))
      val i = building.intersect(rich).withColumn("op", lit("intersect"))
      val e = building.except(rich).withColumn("op", lit("except"))
      u.union(i).union(e).orderBy(col("op"), col("c_custkey"))
    }),

    // Left-semi / left-anti joins (EXISTS / NOT EXISTS): customers with and
    // without orders. Semi/anti keep the probe side narrow — no payload from
    // the build side crosses the exchange.
    "j5_semi_anti" -> ((s, d) => {
      val c = customer(s, d).select(col("c_custkey"))
      val o = orders(s, d).select(col("o_custkey"))
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .withColumn("has_orders", lit(true))
      val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .withColumn("has_orders", lit(false))
      withOrders.union(withoutOrders).orderBy(col("c_custkey"))
    }),

    // Full outer join: per-nation customer counts against the nation dim,
    // keeping nations with zero customers AND (synthetically filtered)
    // customers with no nation row. Aggregate BEFORE the join so the outer
    // join sees one row per key on each side.
    "j6_full_outer" -> ((s, d) => {
      val counts = customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val n = nation(s, d).filter(col("n_nationkey") % 2 === 0)
        .select(col("n_nationkey"), col("n_name"))
      counts.join(n, col("c_nationkey") === col("n_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("n_nationkey")).as("nationkey"),
          coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .orderBy(col("nationkey"))
    }),

    // As-of join: for each purchase event, the most recent view (ts <= purchase
    // ts) by the same user. Union+window formulation: mark both streams, sort
    // once per user by (ts, marker), take the running last view timestamp.
    // One shuffle on user_id; no correlated probe, no range join.
    "j7_asof" -> ((s, d) => {
      val e = events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("ts_ns"),
          lit(1).as("is_probe"))
      val views = e.filter(col("event_type") === "view")
        .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
          col("ts_ns"), lit(0).as("is_probe"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.union(views)
        .withColumn("last_view_ts",
          last(when(col("is_probe") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("is_probe") === 1)
        .select(col("event_id"),
          date_format(col("last_view_ts"), "yyyy-MM-dd HH:mm:ss").as("last_view"))
        .orderBy(col("event_id"))
    }),

    // Range join rewritten as equi-join: bucket events.value into fixed-width
    // bands and join the (broadcast) band dim on the computed key. The
    // scalable shape for "value BETWEEN lo AND hi" when bands are regular.
    "j8_range_bucket" -> ((s, d) => {
      val bands = region(s, d).select(
        col("r_regionkey").cast("long").as("band_id"),
        col("r_name").as("band_name"))
      val e = events(s, d).select(col("event_id"),
        least(floor(col("value") / 100), lit(4L)).as("band_id"))
      e.join(broadcast(bands), Seq("band_id"))
        .select(col("event_id"), col("band_id"), col("band_name"))
        .orderBy(col("event_id"))
    }),

    // Pivot: per-user event-type counts as columns. Spark's pivot plans as a
    // single partial-aggregable groupBy with conditional counts — exactly
    // the CASE-WHEN formulation the oracle runs.
    "g2_pivot" -> ((s, d) => {
      events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    // TPC-H Q5-shaped 5-way join: two broadcast dims (region→nation chain),
    // three fact hops, decimal-exact revenue aggregation.
    // TPC-H Q10 shape: who returned the most revenue in a quarter — big
    // fact⨝fact equi-joins with the date filter PUSHED to the orders
    // scan and the R-flag filter to the lineitem scan, nation broadcast,
    // then a customer-keyed rollup and TakeOrdered top-20 (never a
    // global sort).
    "q19_returned_items" -> ((s, d) => {
      val c = customer(s, d)
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_returnflag") === "R")
      val n = nation(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    "q5_region_revenue" -> ((s, d) => {
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val n = nation(s, d)
      val c = customer(s, d)
      val o = orders(s, d)
      val l = lineitem(s, d)
      r.join(broadcast(n), col("r_regionkey") === col("n_regionkey"))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // JSON extraction from the events.props string column (the extension
    // surface's typed-metadata path, SURVEY X5).
    "f_json_extract" -> ((s, d) => {
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.missing").as("missing_str"))
        .orderBy(col("event_id"))
    }),

    // MAP scalar family: JSON → MapType plus map built from columns;
    // map_keys/map_values/element_at/size and the transform_values HOF.
    // Maps have no cross-engine serialization, so every output is projected
    // through sorted-array_join or scalar lookups (dialect-neutral hashing).
    "f14_maps" -> ((s, d) => {
      import org.apache.spark.sql.types.{MapType, StringType}
      events(s, d)
        .select(col("event_id"), col("event_type"), col("user_id"),
          from_json(col("props"), MapType(StringType, StringType)).as("pm"))
        .withColumn("m",
          map(lit("type"), col("event_type"),
            lit("uid"), col("user_id").cast("string")))
        .select(col("event_id"),
          array_join(array_sort(map_keys(col("pm"))), ",").as("prop_keys"),
          element_at(col("pm"), "k").cast("long").as("k_val"),
          size(col("pm")).as("n_props"),
          element_at(col("m"), "type").as("type_val"),
          array_join(array_sort(map_values(
            transform_values(col("m"), (_, v) => upper(v)))), ",").as("vals_up"))
        .orderBy(col("event_id"))
    }),

    // STRUCT scalar family: named_struct build, field access, whole-struct
    // equality — outputs projected to scalars (structs have no
    // dialect-neutral serialization).
    "f15_structs" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderkey"),
          struct(col("o_orderpriority").as("p"), col("o_totalprice").as("t")).as("st"))
        .select(col("o_orderkey"),
          col("st.p").as("p_out"),
          col("st.t").as("t_out"),
          (col("st") === struct(lit("1-URGENT").as("p"), col("st.t").as("t")))
            .as("is_urgent_struct"))
        .orderBy(col("o_orderkey"))
    }),

    // BITWISE scalar family: and/or/xor/shifts/popcount on BIGINT keys —
    // exact integer semantics on both engines.
    "f16_bitwise" -> ((s, d) => {
      val k = col("o_orderkey")
      orders(s, d)
        .select(k,
          k.bitwiseAND(lit(255L)).as("b_and"),
          k.bitwiseOR(lit(4080L)).as("b_or"),
          k.bitwiseXOR(lit(1365L)).as("b_xor"),
          (k * 8).as("b_shl"), // << 3 spelled as *8: identical BIGINT result
          shiftright(k, 2).as("b_shr"),
          bit_count(k).cast("long").as("b_pop"))
        .orderBy(col("o_orderkey"))
    }),

    // ROLLUP grouping sets with GROUPING() markers; null group keys coalesced
    // to a sentinel so the hash compare is dialect-neutral.
    "g1_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"), col("g_rf"), col("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("returnflag"), col("linestatus"))
    }),

    // CUBE: every grouping-set combination (rollup's superset) — same
    // partial-aggregable expand+hash shape, decimal sums for determinism.
    "g3_cube" -> ((s, d) => {
      lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"), col("g_rf"), col("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("returnflag"), col("linestatus"))
    }),

    // TPC-H Q15 shape — TOP SUPPLIER(S) BY WINDOWED REVENUE: per-supplier
    // decimal revenue over a 90-day ship window, then every supplier
    // achieving the maximum (Q15's view + max-join tie semantics, kept as
    // a 1-row broadcast instead of a re-scan). The fact side aggregates
    // once, partial-aggregable; the max never causes a second lineitem
    // pass.
    "q15_top_supplier" -> ((s, d) => {
      // window bounds as epoch micros (1996-01-01, 1996-04-01 UTC) — the
      // repo's no-timezone-arithmetic rule; identical integers on both
      // engines regardless of the column's NTZ/LTZ physical reading
      val rev = lineitem(s, d)
        .filter(unix_micros(col("l_shipdate").cast("timestamp"))
            .between(820454400000000L, 828316799999999L))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .as("rev"))
        .persistTracked()
      val mx = rev.agg(max(col("rev")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev") === col("mx"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q16 shape — SUPPLIER BREADTH PER PART CLASS: distinct
    // suppliers per (brand, size) over the lineitem part-supplier pairs
    // (the schema's partsupp stand-in), excluding one brand, a size list,
    // and "complaint" suppliers (acctbal < 1000 — the schema's stand-in
    // for Q16's NOT LIKE complaints subquery, applied as an anti-join so
    // the exclusion list never broadcasts the fact side). count-distinct
    // shuffles once on the group key.
    "q16_supplier_breadth" -> ((s, d) => {
      val bad = supplier(s, d).filter(col("s_acctbal") < 1000)
        .select(col("s_suppkey"))
      val p = part(s, d)
        .filter(col("p_brand") =!= "Brand#45" &&
          col("p_size").isInCollection(Seq(3, 9, 14, 19, 23, 36, 45, 49)))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    // TPC-H Q17 shape — SMALL-QUANTITY REVENUE: lineitems below 20% of
    // their part's average quantity. The correlated avg decorrelates into
    // ONE per-part pre-aggregate joined back (never a per-row subquery),
    // and the 0.2·avg predicate multiplies through (5·qty·n < sum) so no
    // division exists on either engine — decimal·int arithmetic is exact.
    "q17_small_quantity" -> ((s, d) => {
      val stats = lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
          count(lit(1)).as("n"))
      lineitem(s, d)
        .join(stats, Seq("l_partkey"))
        .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("n") <
          col("sq"))
        .agg(count(lit(1)).as("n_small"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_extprice"))
    }),

    // TPC-H Q22 shape — DORMANT RICH CUSTOMERS: customers above the
    // positive-balance average with no RECENT orders (none since
    // 2001-01-01 — the driver corpus gives every customer some order, so
    // Q22's "no orders ever" leg would be vacuous; the recency cutoff
    // keeps the identical plan shape against live data). The scalar
    // average broadcasts as a 1-row frame with the comparison multiplied
    // through (bal·n > sum — exact decimal·int, no division);
    // order-presence is a left-anti join keeping the probe side narrow.
    "q22_dormant_customers" -> ((s, d) => {
      val pos = customer(s, d).filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("sp"),
          count(lit(1)).as("np"))
      val recent = orders(s, d)
        .filter(unix_micros(col("o_orderdate").cast("timestamp")) >=
          978307200000000L)
        .select(col("o_custkey"))
      customer(s, d)
        .crossJoin(broadcast(pos))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("np") > col("sp"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("totacctbal"))
        .orderBy(col("c_nationkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem
        |  WHERE epoch_us(l_shipdate) BETWEEN 820454400000000
        |    AND 828316799999999
        |  GROUP BY 1),
        |mx AS (SELECT max(rev) AS mx FROM rev)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
        |FROM rev, mx JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = mx ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_breadth" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q17_small_quantity" ->
      """WITH stats AS (SELECT l_partkey,
        |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq, count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_small,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_extprice
        |FROM lineitem JOIN stats USING (l_partkey)
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq""".stripMargin,

    "q22_dormant_customers" ->
      """WITH pos AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sp,
        |  count(*) AS np FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * np > sp
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND epoch_us(o_orderdate) >= 978307200000000)
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "s1_setops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT c_custkey, op FROM (
        |  SELECT c_custkey, 'union' AS op FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich)
        |  UNION ALL
        |  SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
        |  UNION ALL
        |  SELECT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
        |) ORDER BY op, c_custkey""".stripMargin,

    "j5_semi_anti" ->
      """SELECT c_custkey, TRUE AS has_orders FROM customer c
        |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, FALSE AS has_orders FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j6_full_outer" ->
      """SELECT COALESCE(c_nationkey, n_nationkey) AS nationkey,
        |  COALESCE(n_name, 'UNKNOWN') AS nation_name,
        |  COALESCE(n_customers, 0) AS n_customers
        |FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey) counts
        |FULL OUTER JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 2 = 0) n
        |  ON c_nationkey = n_nationkey
        |ORDER BY nationkey""".stripMargin,

    "j7_asof" ->
      """WITH u AS (
        |  SELECT event_id, user_id, ts, 1 AS is_probe FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT NULL AS event_id, user_id, ts, 0 AS is_probe FROM events WHERE event_type = 'view'
        |), f AS (
        |  SELECT event_id, is_probe,
        |    last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_probe
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
        |  FROM u
        |)
        |SELECT event_id, strftime(last_view_ts, '%Y-%m-%d %H:%M:%S') AS last_view
        |FROM f WHERE is_probe = 1 ORDER BY event_id""".stripMargin,

    "j8_range_bucket" ->
      """SELECT event_id, band_id, band_name
        |FROM (SELECT event_id, LEAST(CAST(floor(value / 100) AS BIGINT), 4) AS band_id FROM events) e
        |JOIN (SELECT CAST(r_regionkey AS BIGINT) AS band_id, r_name AS band_name FROM region) b
        |  USING (band_id)
        |ORDER BY event_id""".stripMargin,

    "g2_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q19_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "f_json_extract" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS missing_str
        |FROM events ORDER BY event_id""".stripMargin,

    "f15_structs" ->
      """SELECT o_orderkey,
        |  o_orderpriority AS p_out,
        |  o_totalprice AS t_out,
        |  ({'p': o_orderpriority, 't': o_totalprice} =
        |   {'p': '1-URGENT', 't': o_totalprice}) AS is_urgent_struct
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f16_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 4080 AS b_or,
        |  xor(o_orderkey, 1365) AS b_xor,
        |  o_orderkey * 8 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS b_pop
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f14_maps" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  len(json_keys(props)) AS n_props,
        |  event_type AS type_val,
        |  array_to_string(list_sort([upper(event_type), upper(CAST(user_id AS VARCHAR))]), ',') AS vals_up
        |FROM events ORDER BY event_id""".stripMargin,

    "g1_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  GROUPING(l_returnflag) AS g_rf,
        |  GROUPING(l_linestatus) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin,

    "g3_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  GROUPING(l_returnflag) AS g_rf,
        |  GROUPING(l_linestatus) AS g_ls
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin
  )
}
