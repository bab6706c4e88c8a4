package graft.operators

import org.apache.spark.sql.DataFrame

/** Iteration-round pinning with a cluster-grade reliable option.
  *
  * Every iterative family (pagerank/ppr/textrank rounds, peels and
  * fixpoints, DistRank's slice frame, per-level derivation pins) eagerly
  * pins each round's frame to truncate lineage and materialize once. The
  * default pin is `localCheckpoint(true)`: fast, but its blocks live only
  * on executors — on a real cluster, losing one executor makes every
  * later iteration unrecoverable (the fault-tolerance hole the pagerank
  * family documented since round 9). Setting the session conf
  *
  *   spark.graft.checkpointDir = hdfs://.../ckpt   (or any shared FS)
  *
  * switches every pin in the process to RELIABLE `checkpoint(true)` into
  * that directory — the recoverable shape a long-running 100 TB job
  * wants; executors can die and the round data re-reads from the
  * checkpoint store. Default (conf unset) behavior is bit-identical to
  * the old inline localCheckpoint calls; a PlanSpec parity test runs one
  * full pagerank member both ways.
  *
  * The SparkContext checkpoint dir is set once per JVM on first reliable
  * pin (setCheckpointDir mints a UUID subdir per call — re-setting every
  * round would scatter files across subdirs for nothing).
  */
object RoundPin {
  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir").filter(_.nonEmpty) match {
      case Some(dir) =>
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }
  }
}
