package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic

/** Bridge to `private[sql]` Spark session APIs the engine needs.
  *
  * `cloneSession()` copies the full session state — every runtime conf,
  * temp view and registered function — into an isolated session sharing
  * the same SparkContext. The graft-bucket catalog query uses it to set
  * storage-partitioned-join planner confs WITHOUT leaking them into the
  * caller's session (the returned frame is lazy, so a try/finally
  * restore would fire before planning reads the confs). `newSession()`
  * is public but resets runtime confs to defaults, which would silently
  * drop a caller's session tuning from the cloned query's planning.
  */
object SparkBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()
}
