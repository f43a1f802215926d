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
    */
  def applyCdc(changelog: DataFrame, key: String, ts: String,
      tiebreak: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(tiebreak).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn")
  }
}
