package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Library entry point for configured deployments: registers every graft
  * native Catalyst expression at session build via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL and `call_function`
  * callers need no imperative `NativeExpressions.register` call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.NativeExpressions.inject(ext)
}
