package graft.ext

import org.apache.spark.sql.DataFrame

/** Materialization policy for iterative operators (connected
  * components, Lloyd refinement, BPE rounds): every round's
  * loop-carried frame must be cut from its lineage or each iteration
  * lazily re-runs all prior ones.
  *
  * `localCheckpoint` (the default) stores blocks on the executors —
  * right for a single-JVM session and for honest re-measurement (it is
  * invisible to the CacheManager), but blocks die with an executor, so
  * a long-running cluster job would recompute from nothing it can
  * reach. Passing `checkpointDir` switches to durable `checkpoint()`
  * into that directory (HDFS/S3 on a real cluster) — the posture the
  * scaladocs of [[Dedup.dupClusters]] and friends have always named;
  * this makes it a one-argument switch instead of a fork of the
  * operator. */
object Checkpoints {

  /** The dir LAST PASSED to setCheckpointDir per context. SparkContext
    * itself stores `<dir>/<random UUID>` (it appends a fresh UUID
    * subdirectory on every call), so `getCheckpointDir` can never
    * equal the caller's dir — re-setting per cut would scatter each
    * iteration's checkpoint into its own UUID directory and pay a
    * mkdirs RPC per round. Weak keys: contexts stop pinning entries
    * once they are collectable. */
  private val lastSet = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  /** Cut `df`'s lineage: durable `checkpoint()` under `dir` when set,
    * else executor-local `localCheckpoint()`. Both are eager. A given
    * dir is installed once per SparkContext; consecutive cuts (the
    * iterative-operator loop) share one UUID checkpoint directory. */
  def cut(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      lastSet.synchronized {
        if (lastSet.get(sc) != d) {
          sc.setCheckpointDir(d)
          lastSet.put(sc, d)
        }
      }
      df.checkpoint()
    case None => df.localCheckpoint()
  }
}
