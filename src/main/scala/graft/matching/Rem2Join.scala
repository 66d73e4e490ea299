package graft.matching

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.norm.Normalize

/** J2/J3 probe side: per entity, try candidates in priority order (selected
  * name first, then Latin aliases) × key variants (k1 > k2 > k3); the first
  * index hit wins; no hit ⇒ empty candidate (SURVEY §2.4, main.py:810–830).
  *
  * One broadcast hash join replaces the reference's per-row dict probes: the
  * probe fan-out is |candidates|×3 rows per entity, the join is
  * BroadcastHashJoinExec (index is tiny), and the priority pick is a
  * row_number over (cand_rank, variant_rank) — explicit ranks, never
  * implicit order (SURVEY H5).
  *
  * A hit with an EMPTY rem2 string still terminates the probe (the reference
  * checks `key in mapping`, not the value) — hence the `matched` marker
  * column rather than a non-empty filter.
  */
object Rem2Join {

  /** entities must carry (entity_seq, candidates: array<string>);
    * index is (key, rem2). Returns (entity_seq, rem2_candidate). */
  def probe(entities: DataFrame, index: DataFrame): DataFrame = {
    val probes = entities
      .select(col("entity_seq"), posexplode(col("candidates")).as(Seq("cand_rank", "cand")))
      .select(col("entity_seq"), col("cand_rank"),
        posexplode(Normalize.variantsArray(col("cand"))).as(Seq("variant_rank", "key")))
      .filter(col("key") =!= "")

    val hits = probes.join(
      broadcast(index.withColumn("matched", lit(true))), Seq("key"))

    val w = Window.partitionBy(col("entity_seq"))
      .orderBy(col("cand_rank"), col("variant_rank"))
    val first = hits
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("entity_seq"), col("rem2").as("rem2_candidate"))

    entities.select(col("entity_seq"))
      .join(first, Seq("entity_seq"), "left")
      .select(col("entity_seq"),
        coalesce(col("rem2_candidate"), lit("")).as("rem2_candidate"))
  }
}
