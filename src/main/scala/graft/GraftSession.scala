package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Library users call `GraftSession.builder()` (or decorate their own
  * builder via [[configure]]) and get: UTC session timezone (oracle
  * parity), AQE with skew-join handling, zstd parquet output, graft's
  * SQL extensions (cosine_sim), and local-mode shuffle parallelism from
  * SPARK_GRAFT_CPUS. On a real cluster, master/memory/shuffle come from
  * spark-submit and everything here still applies.
  */
object GraftSession {

  /** Repo root for committed test fixtures (`fixtures/…`). Resolution:
    * GRAFT_REPO_ROOT env var if set, else the JVM working directory —
    * sbt runs tests/mains from the project root, so fixture-backed
    * gates work from any checkout location, not just /root/repo. */
  lazy val repoRoot: String =
    sys.env.getOrElse("GRAFT_REPO_ROOT", sys.props("user.dir"))

  /** Absolute path of a committed fixture directory/file. */
  def fixture(rel: String): String = s"$repoRoot/fixtures/$rel"

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.compression.codec", "zstd")
    // µs-unit parquet timestamps (not INT96/ns): matches what every
    // other engine (DuckDB, arrow) emits, so downstream type-sensitive
    // readers see identical schemas from either side
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** Local-mode builder (tests, CLIs, single-node runs). */
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
  }

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // extensions config only applies at construction; make the SQL
    // functions available even if an existing session was returned
    plans.GraftExtensions.register(s)
    s
  }
}
