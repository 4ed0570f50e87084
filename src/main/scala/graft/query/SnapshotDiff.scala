package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set difference of the LIVE document sets of two snapshots (usually of
  * one index) — the incremental-consumer verb: a downstream pipeline
  * pinned to snapshot A asks "what changed by snapshot B" and reads
  * (doc_id, change ∈ {removed, added}) rows instead of re-scanning the
  * corpus. Documents are immutable in this engine (append-new and
  * tombstone verbs only), so add/remove is the complete change
  * vocabulary. Reference analog: the re-runnable tokenize_dataset skip —
  * "which files still need work" (utils/split.py:98-104) — lifted to a
  * first-class relational answer.
  *
  * Scale shape: two live-docstats scans + two anti-joins; the output is
  * change-sized, the shuffle is docstats-sized (both sides already
  * docId-bucket-clustered on disk), and nothing reaches the driver. */
object SnapshotDiff {
  def diff(from: IndexHandle, to: IndexHandle): DataFrame = {
    val a = from.docstats.toDF().select(col("docId").as("doc_id"))
    val b = to.docstats.toDF().select(col("docId").as("doc_id"))
    a.join(b, Seq("doc_id"), "left_anti").withColumn("change", lit("removed"))
      .unionByName(b.join(a, Seq("doc_id"), "left_anti").withColumn("change", lit("added")))
  }
}
