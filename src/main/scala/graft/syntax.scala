package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Shared `$"col"` interpolator for code outside a SparkSession scope
  * (operators/functions objects can't `import spark.implicits._`).
  */
object syntax {
  implicit class Dollar(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.parts.mkString)
  }
}
