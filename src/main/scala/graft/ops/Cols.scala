package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers shared by the pipeline operators. */
object Cols {

  /** Bind `e` as a lambda VARIABLE for `f` (a `transform` over a 1-element
    * array), so `e` evaluates exactly once per row no matter how many times
    * — or inside how many higher-order-function lambdas — `f` references
    * it. A non-trivial Column subtree referenced from inside a HOF lambda
    * re-evaluates per element, and the optimizer's projection collapsing
    * re-inlines named columns, so an alias is no protection either.
    * Measured consequence of omitting this: winnowing fingerprints at
    * O(positions² × length) per row, ~1 s per 300-char doc (340× the bound
    * form).
    */
  def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)
}
