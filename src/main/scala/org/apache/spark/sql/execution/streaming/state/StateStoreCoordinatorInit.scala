package org.apache.spark.sql.execution.streaming.state

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession

/** Access bridge into `private[sql]` Spark internals (hence the package):
  * ensure the driver-side `StateStoreCoordinator` RPC endpoint exists.
  *
  * Streaming queries register it on start, but BATCH `transformWithState`
  * also runs on the RocksDB state-store provider, whose snapshot-upload
  * reporting resolves the coordinator from the executor side
  * (`RocksDBEventForwarder.reportSnapshotUploaded`) — in a session that has
  * never started a streaming query the lookup dies with
  * `RpcEndpointNotFoundException` and fails the store load. `forDriver` is
  * idempotent (registers or retrieves), so calling this before a batch
  * transformWithState is always safe.
  */
object StateStoreCoordinatorInit {
  def ensure(spark: SparkSession): Unit = {
    StateStoreCoordinatorRef.forDriver(SparkEnv.get,
      spark.sessionState.conf)
    ()
  }
}
