package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL-surface registration for graft's native expressions so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works: either call
  * [[GraftSqlFunctions.register]] on a live session, or configure
  * `spark.sql.extensions=org.apache.spark.sql.graftshim.GraftExtensions`.
  */
object GraftSqlFunctions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (exprs => {
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"cosine_similarity requires exactly 2 arguments, got ${exprs.length}")
      CosineSimilarity(exprs(0), exprs(1))
    }),
    "int8_cosine_similarity" -> (exprs => {
      if (exprs.length != 4)
        throw new IllegalArgumentException(
          s"int8_cosine_similarity requires exactly 4 arguments " +
            s"(bytes, scale, offset, query), got ${exprs.length}")
      Int8CosineSimilarity(exprs(0), exprs(1), exprs(2), exprs(3))
    }))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftSqlFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name), builder))
    }
}
