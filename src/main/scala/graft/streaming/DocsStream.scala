package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Streaming form of the document-dedup pipeline: exact dedup over an
  * unbounded stream via fingerprint + `dropDuplicatesWithinWatermark`.
  *
  * Scale notes: the dedup state holds one row per distinct fingerprint
  * seen within the watermark horizon — the watermark EVICTS state for
  * fingerprints whose last occurrence has aged out, which is what makes
  * exact dedup on a 100 TB/day stream possible at all (an unbounded
  * `dropDuplicates` would accumulate every fingerprint forever). The
  * trade-off is the horizon: a duplicate arriving later than `lateness`
  * after its original is emitted again — downstream batch dedup
  * ([[graft.llm.Dedup.exactDups]]) remains the exactness backstop.
  */
object DocsStream {

  /** Emit the first-arriving document per normalized-text fingerprint;
    * duplicates within the watermark horizon are dropped. Works on a
    * streaming DataFrame with an event-time column `tsCol`; the input's
    * own columns pass through plus the `fp` fingerprint.
    */
  def dedupStream(docs: DataFrame, textCol: String = "text",
                  tsCol: String = "ts", lateness: String = "1 hour"): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")
}
