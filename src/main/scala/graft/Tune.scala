package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session tuning shared by every graft main (round 19).
  * Scale-dependent values are env-parameterised with local defaults —
  * never constants that only make sense on `local[32]`.
  */
object Tune {

  /** `spark.sql.sources.parallelPartitionDiscovery.threshold`: above this
    * many paths Spark lists a directory tree with a DISTRIBUTED JOB
    * instead of on the driver. The persisted-index layouts here are
    * 64–4096 bucket directories (the [[ops.DedupIndex.bucketsFor]] /
    * [[ops.TextIndex.bucketsFor]] clamps), so the default threshold of
    * 32 made EVERY `read.parquet` of an index table pay a full job
    * (~140–390 ms of scheduling for a millisecond of local listing);
    * q165's serve path alone carried 8 such jobs (~1.1–2 s, measured
    * round 19). 4200 covers the 4096-bucket clamp with slack: a driver
    * listing of ≤4200 directories is microseconds-per-path on
    * local/HDFS-class filesystems. Deployments on high-latency object
    * stores with wider tables should lower it via
    * `SPARK_GRAFT_LIST_PAR_THRESHOLD` — that is the regime the
    * distributed listing exists for.
    */
  val ListParThreshold: String =
    sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "4200")

  /** Apply the shared engine confs to a session builder. */
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.sources.parallelPartitionDiscovery.threshold",
      ListParThreshold)
}
