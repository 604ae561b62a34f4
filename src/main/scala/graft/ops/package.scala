package graft

import org.apache.spark.sql.Column

/** Helpers shared by every operator family. */
package object ops {
  /** THE cross-engine money cast (SURVEY §7.3 rule 2): per-row cast to the
    * expression's exact decimal scale so aggregates are associative and
    * partition-order independent, emitted as DOUBLE only at the boundary.
    * One definition on purpose — if the scale ever changes, every engine
    * pair must move in lockstep or oracles silently diverge. */
  private[ops] def dec(c: Column): Column = c.cast("decimal(18,4)")
}
