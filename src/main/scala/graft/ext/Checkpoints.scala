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

  /** What THIS object installed per context: (caller dir, the resolved
    * `<dir>/<random UUID>` SparkContext actually stores — it appends a
    * fresh UUID subdirectory on every setCheckpointDir call, so
    * `getCheckpointDir` can never equal the caller's dir). Weak keys:
    * contexts stop pinning entries once they are collectable. */
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext,
      (String, Option[String])]())

  /** Cut `df`'s lineage: durable `checkpoint()` under `dir` when set,
    * else executor-local `localCheckpoint()`. Both are eager.
    *
    * Dir policy (per context):
    *  - consecutive cuts to ONE dir — the iterative-operator loop —
    *    install it once and share one UUID checkpoint directory;
    *  - a checkpoint dir configured OUTSIDE this object is never
    *    silently overridden: the first durable cut on such a context
    *    fails loudly (clear the external dir, or route the operator's
    *    cuts to it by passing None? — None means local; pass the same
    *    dir to agree with it);
    *  - operators alternating DIFFERENT dirs on one context are legal
    *    but re-pay setCheckpointDir per flip (a fresh UUID subdir +
    *    mkdirs): SparkContext holds exactly one checkpoint dir and no
    *    public API re-enters a previous UUID subdir. Prefer one
    *    durable dir per session. */
  def cut(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      installed.synchronized {
        val cur = installed.get(sc)
        val active = sc.getCheckpointDir
        val cachedAndUntouched =
          cur != null && cur._1 == d && active == cur._2
        if (!cachedAndUntouched) {
          require(cur != null || active.isEmpty,
            s"SparkContext already has checkpoint dir ${active.orNull} " +
              "configured outside graft.ext.Checkpoints; refusing to " +
              s"silently override it with $d — clear it or pass the same dir")
          sc.setCheckpointDir(d)
          installed.put(sc, (d, sc.getCheckpointDir))
        }
      }
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** [[cut]] that first restores cluster-width parallelism when the
    * frame has collapsed below it. Iterative operators carry small
    * frames between rounds (a 95k-row reach set, a centroid table's
    * assignment); AQE rightly coalesces their post-shuffle layout to
    * one or two partitions — and then the NEXT round's join fans the
    * frame out 100-1000x and inherits those two partitions, leaving
    * the rest of the cluster idle (guide §2.6: the fan-out stage must
    * run at cluster width, not at the width of its small input). The
    * repartition is GATED on the observed partition count so a frame
    * that is already at or above `defaultParallelism` — every
    * at-scale case — pays nothing; only a coalesced-small frame pays
    * one cheap exchange of its own (small) bytes before the expensive
    * stage. */
  def spreadCut(df: DataFrame, dir: Option[String] = None): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val cur = df.rdd.getNumPartitions
    if (cur < p) cut(df.repartition(p), dir) else cut(df, dir)
  }

  /** The no-materialization half of [[spreadCut]]: gated cluster-width
    * repartition with NO lineage cut — for a SINGLE heavy consumer
    * (one wide decimal-moment aggregate, one expensive per-row
    * projection) where a checkpoint would be pure overhead. Partial
    * aggregation runs at the width of its input; when a scan yields
    * fewer splits than cores (small files, one row group), the whole
    * per-row decimal/hash cost serializes onto those few cores. The
    * gate makes it free at scale: a frame already at or above
    * `defaultParallelism` is returned untouched. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Test hook: forget what was installed for `sc` (specs share one
    * context per JVM and need a clean slate to exercise the
    * first-install paths). */
  private[ext] def forget(sc: org.apache.spark.SparkContext): Unit =
    installed.synchronized { installed.remove(sc); () }
}
