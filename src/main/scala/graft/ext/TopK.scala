package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

/** Column-API entry for the custom per-key top-k operator
  * (plans.TopKPerKey): `TopK.perKey(df, Seq($"k"), Seq($"v".desc), 3)`
  * keeps each key's first 3 rows under the given order without sorting
  * key groups. Pass `.asc`/`.desc` Columns for the order; bare Columns
  * default to ascending. The order must be total (append a unique id)
  * for a deterministic k boundary. */
object TopK {

  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int)
  : DataFrame = {
    val spark = df.sparkSession
    val sortOrders = order.map(c => B.resolvedExpression(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    B.ofRows(spark,
      graft.plans.TopKPerKey(keys.map(B.resolvedExpression(spark, _)),
        sortOrders, k, B.logicalPlan(df)))
  }
}
