package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured ingestion via Spark 4's VARIANT type: parse the raw
  * JSON payload column once into the binary VARIANT encoding, then
  * extract typed fields with `variant_get` path expressions.
  *
  * Why VARIANT over per-field `get_json_object`: the text is parsed
  * ONCE per row (n extractions re-parse n times with the string
  * functions), the encoding is columnar-friendly binary, and unknown/
  * evolving keys survive without schema migration — exactly the shape
  * an event-props / crawl-metadata column needs at 100 TB. Extraction
  * is a narrow codegen'd projection; no shuffle, no UDF.
  */
object SemiStructured {

  /** Shred the events `props` JSON payload: one VARIANT parse, typed
    * field extraction (`$.k` as INT in the test schema).
    */
  def shredProps(events: DataFrame): DataFrame =
    events
      .withColumn("pv", parse_json(col("props")))
      .withColumn("prop_k", expr("variant_get(pv, '$.k', 'int')"))

  /** DuckDB oracle fragment for the typed `$.k` extraction. */
  object O {
    def propK(c: String = "props"): String =
      s"CAST(json_extract_string($c, '$$.k') AS INT)"
  }
}
