package graft.tools

import org.apache.spark.sql.SparkSession

/** The session recipe every LONG-RUNNING single-JVM drive shares (Verify,
  * ScaleProbe — any tool that runs many shuffle-producing queries back to
  * back in one driver). Hard-won at the sf100 rung; kept in ONE place so the
  * next long-running tool inherits it instead of re-learning it with a full
  * disk:
  *
  *  - `spark.cleaner.periodicGC.interval=5min`: shuffle files are deleted
  *    only after a driver GC collects the shuffle dependency and the
  *    ContextCleaner notices — the 30min default let ~40 GB of dead files
  *    from early queries sit on disk until the ~1B-edge graph build died
  *    mid-spill ("No space left on device"). Callers should ALSO
  *    `System.gc()` between top-level units of work (see Verify's loop).
  *  - zstd shuffle/spill compression: correctness/probe drives are
  *    DISK-bound at the scale rungs; zstd shrinks shuffle + spill files
  *    ~35-40% vs lz4 for CPU cost that is noise next to the IO it avoids.
  *    Bench deliberately KEEPS lz4 — latency there is CPU-bound.
  *  - pinned UTC session TZ + `nanosAsLong` at construction: events.ts has
  *    shipped as TIMESTAMP(NANOS); setting it here means Tables.events never
  *    mutates conf mid-session.
  */
object LongDrive {
  /** `shufflePartitions` maps the resolved SPARK_GRAFT_CPUS value to the
    * shuffle-partition setting (Verify tracks the core count; probes pin 32).
    */
  def session(defaultCpus: String)(shufflePartitions: String => String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
