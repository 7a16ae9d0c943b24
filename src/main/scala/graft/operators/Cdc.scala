package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an upsert/delete change stream
  * into the current snapshot (SCD1 / "MERGE INTO" semantics as a batch
  * operator). The winner per key is the newest change by `orderCols`
  * (must end in a unique tie-breaker); a winning delete removes the key
  * from the snapshot entirely.
  *
  * Scale design: one keyed window shuffle — the same shape as
  * latest-per-key (W7); no join against the previous snapshot is needed
  * because the change stream is self-contained. Applying on top of an
  * existing snapshot = union snapshot-as-upserts with the stream first.
  */
object Cdc {

  def applyLatest(changes: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn", opCol)
  }
}
