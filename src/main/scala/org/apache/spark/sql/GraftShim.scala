package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TableFunctionRegistry}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters of the
  * classic (non-Connect) API. Lives in the org.apache.spark.sql package
  * solely to satisfy the access modifier; no Spark internals are
  * modified. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drive a SparkSessionExtensions' collected function injections into
    * a live registry — what SparkSession.Builder does internally when
    * `spark.sql.extensions` is set (`registerFunctions` is
    * `private[sql]`; tests use this to exercise the real injection
    * path). */
  def registerInto(ext: SparkSessionExtensions, registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** Same, for the injected TABLE functions (`injectTableFunction`). */
  def registerTableInto(ext: SparkSessionExtensions, registry: TableFunctionRegistry): Unit =
    ext.registerTableFunctions(registry)
}
