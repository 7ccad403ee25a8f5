package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Pattern

/** Column-level building blocks for the event model: pattern
  * matching, trace stamping, payload access. All are composed from
  * built-in (codegen'd, Catalyst-optimizable) functions — no UDFs in
  * the hot path.
  */
object EventFunctions {

  /** Compile a [[graft.model.Pattern]] to a boolean Column over an
    * event-name column. String patterns become a single anchored
    * `RLIKE` over the dot-sentinel encoding (see Pattern.toRegex);
    * combinators become native boolean algebra, so Catalyst can push
    * the whole predicate into a parquet scan.
    */
  def matchesPattern(name: Column, pattern: Pattern): Column = pattern match {
    case Pattern.Str(_)    => concat(name, lit(".")).rlike(pattern.toRegex)
    case Pattern.And(ps)   => ps.map(matchesPattern(name, _)).reduceLeft(_ && _)
    case Pattern.Or(ps)    => ps.map(matchesPattern(name, _)).reduceLeft(_ || _)
    case Pattern.Not(p)    => !matchesPattern(name, p)
  }

  def matchesPattern(name: Column, pattern: String): Column =
    matchesPattern(name, Pattern.Str(pattern))

  /** A new trace point struct (reference: src/event.ts:218-230):
    * arrival time in fractional unix seconds, pipeline name, and the
    * pipeline-template signature.
    */
  def tracePoint(i: Column, pipeline: String, signature: String): Column =
    struct(i.cast("double").as("i"), lit(pipeline).as("p"), lit(signature).as("h"))

  /** Append a trace point to a trace array column. */
  def appendTrace(t: Column, point: Column): Column =
    concat(coalesce(t, array()), array(point))

  /** Event time of a traced event: the `i` of the last trace point
    * (reference: src/event.ts:96-101), as a double (unix seconds).
    */
  def eventTime(t: Column): Column = element_at(t, -1).getField("i")
}
