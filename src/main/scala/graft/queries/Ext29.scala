package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.tables.Tables._

/** Round-5 additions, part 7 — two curation ops on the document axis:
  *
  *  - x108 code-switch detection: language-ID each HALF of a document and
  *    flag disagreements — the sub-document consistency check that
  *    catches concatenation artifacts and mixed-language pages a
  *    whole-document language ID (x9) averages away.
  *  - x109 leakage-free group split: train/val/test assignment hashed on
  *    the x2 duplicate-CLUSTER key, not the doc id — near-identical
  *    copies always land on the same side, so held-out metrics can't be
  *    inflated by train-set twins (the grouped-split discipline x56's
  *    plain per-doc hash split does not give).
  */
object Ext29 {

  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  /** x9's marker vote over one token-array column: count hits per marker
    * set, take the first language achieving the max ('und' when no marker
    * appears) — spelled identically in the oracle's CASE chain. */
  private def langOf(half: Column): Column = {
    val scores = markers.map { case (_, ms) =>
      size(filter(half, t => t.isInCollection(ms))) }
    val m = greatest(scores: _*)
    markers.zip(scores).foldRight(lit(markers.last._1)) {
      case (((lang, _), sc), rest) => when(sc === m, lang).otherwise(rest)
    } match {
      case cascade => when(m === 0, "und").otherwise(cascade)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X4u CODE-SWITCH DETECTION: split each doc's token sequence in half,
    // run the x9 marker vote on each half independently, flag documents
    // whose halves disagree (both halves confidently identified). Pure
    // per-row expression work inside one scan — no shuffle before the
    // output sort at any corpus size.
    "x108_code_switch" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          slice(col("w"), lit(1), (size(col("w")) / 2).cast("int")).as("wa"),
          slice(col("w"), (size(col("w")) / 2).cast("int") + 1,
            size(col("w")) - (size(col("w")) / 2).cast("int")).as("wb"))
        .select(col("doc_id"), langOf(col("wa")).as("lang_a"),
          langOf(col("wb")).as("lang_b"))
        .withColumn("is_switch",
          col("lang_a") =!= col("lang_b") &&
            col("lang_a") =!= "und" && col("lang_b") =!= "und")
        .orderBy(col("doc_id"))
    }),

    // X4v LEAKAGE-FREE GROUP SPLIT: the split hash is salted over the
    // CLUSTER key (x2's bag-of-words md5), so every member of a duplicate
    // cluster gets the same side by construction — reproducible on any
    // engine (x19's salted md5-prefix convention), 80/10/10. One shuffle
    // (the cluster-size window on the 32-byte key).
    "x109_group_split" -> ((s, d) => {
      val key = md5(concat_ws(" ",
        array_sort(array_distinct(TextOps.words(col("text"))))).cast("binary"))
      val bucket = TextOps.hash32(concat(lit("gsplit:"), col("bow_key"))) % 10
      documents(s, d)
        .select(col("doc_id"), key.as("bow_key"))
        .withColumn("n_copies",
          count(lit(1)).over(Window.partitionBy(col("bow_key"))))
        .select(col("doc_id"), col("n_copies"),
          when(bucket < 8, "train").when(bucket === 8, "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = {
    def scoreSql(half: String) = markers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
      s"len(list_filter($half, x -> list_contains($lst, x))) AS s_${lang}_$half"
    }.mkString(",\n|  ")
    def langSql(half: String) = {
      val m = markers.map(t => s"s_${t._1}_$half").mkString("greatest(", ", ", ")")
      "CASE WHEN " + m + " = 0 THEN 'und' " +
        markers.init.map(t =>
          s"WHEN s_${t._1}_$half = $m THEN '${t._1}'").mkString(" ") +
        s" ELSE '${markers.last._1}' END"
    }
    Map(

      "x108_code_switch" ->
        s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |  WHERE len(string_split(text, ' ')) >= 2),
          |h AS (SELECT doc_id, w[1:len(w)//2] AS wa,
          |  w[len(w)//2+1:len(w)] AS wb FROM w),
          |sc AS (SELECT doc_id,
          |  ${scoreSql("wa")},
          |  ${scoreSql("wb")}
          |  FROM h),
          |l AS (SELECT doc_id, ${langSql("wa")} AS lang_a,
          |  ${langSql("wb")} AS lang_b FROM sc)
          |SELECT doc_id, lang_a, lang_b,
          |  (lang_a <> lang_b AND lang_a <> 'und' AND lang_b <> 'und')
          |    AS is_switch
          |FROM l ORDER BY doc_id""".stripMargin,

      "x109_group_split" ->
        """WITH k AS (SELECT doc_id,
          |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_key
          |  FROM documents),
          |b AS (SELECT doc_id, bow_key,
          |  CAST(count(*) OVER (PARTITION BY bow_key) AS BIGINT) AS n_copies,
          |  CAST(concat('0x', substr(md5('gsplit:' || bow_key),1,8)) AS BIGINT) % 10
          |    AS bucket
          |  FROM k)
          |SELECT doc_id, n_copies,
          |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
          |    ELSE 'test' END AS split
          |FROM b ORDER BY doc_id""".stripMargin)
  }
}
