package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared cross-engine parity helpers — single definitions for the
  * constants/formulas the oracle protocol depends on, so a future change
  * (e.g. the nudge epsilon) cannot drift between query files.
  */
private[queries] object Parity {

  /** Tie-nudged 4dp rounding for doubles: the +1e-7 nudge is mirrored in
    * every oracle SQL string (see Core's scaladoc for the rationale).
    */
  def r4e(c: Column): Column = round(c + lit(1e-7), 4)

  /** ISO day-of-week (Mon=1..Sun=7) from Spark's Sun=1 `dayofweek`;
    * matches DuckDB `isodow`.
    */
  def isoDow(day: Column): Column = (((dayofweek(day) + 5) % 7) + 1).cast("int")
}
