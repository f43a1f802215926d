package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-modeling operators for the warehouse side of the pipeline. */
object Dimensions {

  /** Slowly-changing-dimension type 2: turn a changelog (one row per
    * observed key state) into versioned history rows with
    * [valid_from, valid_to) intervals and an is_current flag.
    *
    * One window per key — a single hash shuffle on `key`, no self-join.
    * `tiebreak` makes the within-timestamp order deterministic (two changes
    * in the same tick would otherwise version nondeterministically).
    * valid_to is the NEXT change's timestamp (half-open intervals chain
    * exactly); the latest version per key has valid_to NULL / is_current.
    */
  def scd2FromChangelog(changelog: DataFrame, key: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    changelog
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC materialization (Debezium-style): collapse an I/U/D change log
    * into the current table state — the latest change per key wins
    * (deterministic (ts, tiebreak) order), and keys whose latest op is a
    * delete disappear. One window over one key shuffle; at 100 TB this
    * runs per changelog batch against a snapshot join rather than over
    * all history (see TrainingData.upsertLatest for the merge form).
    *
    * Width floor (r17 verdict finding #2): Spark plans the rn=1 filter
    * as a WindowGroupLimit whose PARTIAL phase — a per-task top-1 sort —
    * runs below the key exchange at whatever width the scan granted, the
    * exact shape q30 fixed. On a compacted few-row-group source (orders
    * at sf10: 2 row groups) that is two tasks sorting the whole log while
    * the rest of the cluster idles; the guard is data-dependent, so a
    * well-split source passes through un-shuffled.
    */
  def applyCdc(changelog: DataFrame, key: String, ts: String,
      tiebreak: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(tiebreak).desc)
    graft.operators.Shuffle.ensureMinScanWidth(changelog)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn")
  }
}
