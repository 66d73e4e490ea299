package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-5 batch 2: the TPC-H Q2 shape (argmin-per-group decorrelated to a
  * window rank, q10), robust statistics (exact nearest-rank median absolute
  * deviation, w24), Z-order multi-dimensional clustering with zone-map
  * ranges (x62), and the tokenizer ENCODE step over x60's learned merges
  * (x63) — completing the train→apply BPE lifecycle.
  *
  * Determinism rules as everywhere in the catalog (ROUND_NOTES.md):
  * centi/milli-scaled integers instead of float comparisons; nearest-rank
  * (never interpolated) percentiles; bit arithmetic spelled identically on
  * both engines; every result ordered by a unique key.
  */
object Ext10 {

  /** Morton/Z-order interleave of two 8-bit dims — bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Pure integer shifts/masks, spelled
    * term-by-term so the oracle replays the identical arithmetic. */
  private def morton16(a: Column, b: Column): Column =
    (0 to 7).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The oracle spelling of [[morton16]], same term order. */
  private val morton16Sql: String =
    (0 to 7).map { i =>
      s"((a >> $i) & 1) * ${1L << (2 * i)} + ((b >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q10 CHEAPEST OFFER PER PART (TPC-H Q2 shape): for each small part,
    // the lineitem offering it at the lowest price — the correlated
    // `price = (SELECT min(price) …)` subquery every catalog runs,
    // decorrelated to a window rank over the part key. The part filter is
    // a broadcast SEMI-reduction applied BEFORE the window (filtering on
    // the window's own partition key commutes with it), so the rank never
    // sorts the unfiltered fact table; ties break by (suppkey, orderkey,
    // linenumber) for a total order.
    "q10_cheapest_supplier" -> ((s, d) => {
      val p = part(s, d).filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_name"))
      val li = lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber"),
          floor(col("l_extendedprice") * 100.0).cast("long").as("cents"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      li.withColumn("rnk", row_number().over(
          Window.partitionBy(col("l_partkey"))
            .orderBy(col("cents"), col("l_suppkey"), col("l_orderkey"),
              col("l_linenumber"))))
        .filter(col("rnk") === 1)
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("cents"))
        .orderBy(col("p_partkey"))
    }),

    // W24 MEDIAN ABSOLUTE DEVIATION: the robust location/scale pair
    // (median, MAD) per user — the outlier-resistant twin of w20's
    // mean/variance gate. Both medians are exact nearest-rank selections
    // (rank ⌈n/2⌉ via row_number — never interpolated, so integers in and
    // integers out) and both passes share the user_id shuffle; the
    // per-user median frame is group-count sized and broadcasts back.
    "w24_mad" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_id"),
        floor(col("value") * 1000.0).cast("long").as("vm"))
      val w = Window.partitionBy(col("user_id"))
      val med = e
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("vm"), col("event_id"))))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          max(when(col("rn") === expr("(cnt + 1) div 2"), col("vm")))
            .as("med"))
      val dev = e.join(broadcast(med), "user_id")
        .withColumn("dev", abs(col("vm") - col("med")))
      dev
        .withColumn("rn2", row_number().over(
          w.orderBy(col("dev"), col("event_id"))))
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"), max(col("med")).as("med"),
          max(when(col("rn2") === expr("(n + 1) div 2"), col("dev")))
            .as("mad"))
        .select(col("user_id"), col("n"), col("med"), col("mad"))
        .orderBy(col("user_id"))
    }),

    // X62 Z-ORDER LAYOUT + ZONE MAPS: interleave the bits of two query
    // dimensions (user bucket, value bucket) into a Morton key, block the
    // key space, and emit each block's min/max RANGE on both dims — the
    // zone-map statistics a lakehouse stores per file to skip reads. The
    // point of Z-order over a linear sort: BOTH dims' ranges stay narrow
    // per block (a linear sort keeps only its leading dim narrow), so
    // predicates on either dim prune blocks. The whole query is one scan
    // of integer bit arithmetic plus a partial-aggregable rollup.
    "x62_zorder_layout" -> ((s, d) => {
      events(s, d)
        .select(pmod(col("user_id"), lit(256L)).as("a"),
          pmod(floor(col("value") * 1000.0).cast("long"), lit(256L)).as("b"))
        .withColumn("zkey", morton16(col("a"), col("b")))
        .groupBy(expr("zkey div 64").as("block"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("a_min"), max(col("a")).as("a_max"),
          min(col("b")).as("b_min"), max(col("b")).as("b_max"))
        .orderBy(col("block"))
    }),

    // X4y BPE ENCODE: apply x60's learned merge table to the corpus — per
    // document, the token count before and the symbol count after
    // encoding (the number every training pipeline budgets by). Encoding
    // runs on the VOCABULARY (each distinct word carries its symbol array
    // through the merge folds), so corpus-scale work is one broadcast
    // join of word → symbol-count onto the exploded corpus. Rows-only by
    // design, like x60: the oracle cannot iterate data-dependent merges;
    // Ext10Spec pins encode lengths on a hand corpus.
    "x63_bpe_encode" -> ((s, d) => Ext9.bpeEncode(documents(s, d), 6)))

  val oracleSql: Map[String, String] = Map(

    "q10_cheapest_supplier" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_size <= 5),
        |li AS (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
        |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents
        |  FROM lineitem JOIN p ON l_partkey = p_partkey),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY cents, l_suppkey, l_orderkey, l_linenumber) AS rnk
        |  FROM li)
        |SELECT l_partkey AS p_partkey, p_name, s_name, cents
        |FROM r JOIN p ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rnk = 1 ORDER BY p_partkey""".stripMargin,

    "w24_mad" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(floor(value * 1000.0) AS BIGINT) AS vm FROM events),
        |r1 AS (SELECT user_id, event_id, vm,
        |    count(*) OVER (PARTITION BY user_id) AS cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY vm, event_id)
        |      AS rn
        |  FROM e),
        |med AS (SELECT user_id, count(*) AS n,
        |    max(CASE WHEN rn = (cnt + 1) // 2 THEN vm END) AS med
        |  FROM r1 GROUP BY user_id),
        |d AS (SELECT e.user_id, e.event_id, abs(vm - med) AS dev, n, med
        |  FROM e JOIN med ON e.user_id = med.user_id),
        |r2 AS (SELECT user_id, n, med, dev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id)
        |      AS rn2
        |  FROM d)
        |SELECT user_id, max(n) AS n, max(med) AS med,
        |  max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END) AS mad
        |FROM r2 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x62_zorder_layout" ->
      s"""WITH e AS (SELECT user_id % 256 AS a,
        |    CAST(floor(value * 1000.0) AS BIGINT) % 256 AS b FROM events),
        |z AS (SELECT a, b, $morton16Sql AS zkey FROM e)
        |SELECT zkey // 64 AS block, count(*) AS n,
        |  min(a) AS a_min, max(a) AS a_max,
        |  min(b) AS b_min, max(b) AS b_max
        |FROM z GROUP BY 1 ORDER BY block""".stripMargin)
}
