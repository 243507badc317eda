package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** Evaluate-once binding for expressions used inside higher-order
  * lambdas.
  *
  * A lambda body re-evaluates every NON-variable subexpression on each
  * element: higher-order functions (`transform`, `filter`, …) run
  * interpreted (CodegenFallback) with no common-subexpression
  * elimination across iterations, so
  * `transform(sequence(0, size(tk) - n), i => slice(tk, i + 1, n))`
  * with `tk = split(trim(lower(text)), "\\s+")` re-splits the WHOLE
  * document once per window — O(tokens²) work per row for what should
  * be an O(tokens) sliding-window construction. Measured on the p38
  * LM-scoring stage this was ~25× the cost of the bound form.
  *
  * `bindArray(arr, f)` rewrites `f(arr)` so `arr` is evaluated exactly
  * once per row: the array becomes the single element of a wrapper
  * array, the lambda binds it to a NamedLambdaVariable (a stored value,
  * not an expression tree), and every reference inside `f` is then an
  * O(1) variable read. `element_at(_, 1)` unwraps the result.
  * Null-transparent: a null `arr` flows through as a null lambda input,
  * exactly as the unbound expression tree would. */
object BindOnce {
  def bindArray(arr: Column, f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)
}
