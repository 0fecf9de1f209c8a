package graft

import org.apache.spark.sql.ColumnName

/** `$"col"` interpolator for code outside a SparkSession scope (the same
  * syntax `spark.implicits._` provides, minus the session dependency).
  */
object syntax {
  implicit class DollarCol(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
