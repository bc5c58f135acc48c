package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Bridge to re-root a DataFrame's logical plan onto an ISOLATED child
  * session (`newSession`: same SparkContext and cached data, fresh SQL
  * conf). Lets an operator that must raise a session conf for one
  * internal job (e.g. the bloom-build sizing caps in
  * `graft.llm.Dedup.exactIncremental`) do so without the raise ever
  * being observable from — or racing with — concurrent queries on the
  * caller's session. Same placement rationale as [[ColumnBridge]]:
  * subpackage of org.apache.spark.sql solely for `private[sql]` access
  * (`Dataset.ofRows`); no Spark internals of its own. */
object SessionBridge {

  /** A fresh isolated session sharing `df`'s SparkContext, with `confs`
    * applied, plus `df` re-rooted onto it. The returned frame's plan is
    * the SAME resolved logical plan (file relations keep their resolved
    * FileIndex), so no re-analysis against the child catalog occurs. */
  def isolated(df: DataFrame, confs: Map[String, String]): DataFrame = {
    val child = df.sparkSession.asInstanceOf[SparkSession].newSession()
    confs.foreach { case (k, v) => child.conf.set(k, v) }
    Dataset.ofRows(child, df.queryExecution.logical)
  }
}
