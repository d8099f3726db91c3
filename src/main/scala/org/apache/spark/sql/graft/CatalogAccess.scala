package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.connector.catalog.CatalogPlugin

/** Bridge to `private[sql] SessionState.catalogManager`: the lake's SQL
  * DDL statements (CREATE/DROP VIEW, CREATE/DROP MACRO) must resolve a
  * multipart name's leading segment against the session's registered
  * catalogs — the same lookup Spark's own ResolveCatalogs performs — and
  * the manager is not public API. Read-only access; no state is mutated
  * here. */
object CatalogAccess {
  def currentCatalogName(spark: SparkSession): String =
    spark.asInstanceOf[ClassicSparkSession].sessionState.catalogManager.currentCatalog.name()

  def isRegistered(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[ClassicSparkSession].sessionState.catalogManager.isCatalogRegistered(name)

  def catalog(spark: SparkSession, name: String): CatalogPlugin =
    spark.asInstanceOf[ClassicSparkSession].sessionState.catalogManager.catalog(name)

  def isTempView(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[ClassicSparkSession].sessionState.catalogManager
      .v1SessionCatalog.getTempView(name).isDefined

  /** Bridge to `private[sql] ExpressionUtils.expression`: lets lake DML
    * inspect a caller-supplied Column (e.g. detect the literal-TRUE
    * "no WHERE" fallback) without the deprecated Column.expr. */
  def expressionOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
