package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.11 surface): element-wise minimum merge of MinHash
  * signatures. The union-minhash property — the signature of a set UNION is
  * the element-wise min of the per-set signatures — makes a group's
  * signature a mergeable (partial-aggregable) aggregate, so
  * collection-level near-dup signatures (per source, per day, per shard)
  * come out of one map-side-combining groupBy instead of re-shingling
  * concatenated text.
  *
  * Empty buffer = Seq.empty (groups with no usable signature yield empty).
  */
object SignatureAgg extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  private def eMin(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else a.zip(b).map { case (x, y) => math.min(x, y) }

  override def reduce(acc: Seq[Long], sig: Seq[Long]): Seq[Long] =
    if (sig == null) acc else eMin(acc, sig)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = eMin(a, b)

  override def finish(acc: Seq[Long]): Seq[Long] = acc

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
