package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // µs parquet timestamps: the driver + check.py compare output
      // TYPES against DuckDB's µs-unit arrow schema — INT96/ns output
      // reads back as timestamp[ns] and trips the type-drift guard
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same shared fixtures as Bench: frame CONTENT is identical to the
    // per-gate builds (localCheckpoint of the same plan), so the
    // correctness surface is unchanged — only rebuild count drops
    SweepCache.enable()
    new java.io.File(outDir).mkdirs()
    // local-iteration subset (mirrors Bench): SPARK_GRAFT_ONLY=f06,f07
    // runs and records only matching gates; unset = full contract (the
    // driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String): Boolean =
      only.forall(_.exists(p => name == p || name.startsWith(p)))
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // storage hygiene between gates (the Bench discipline): drop
      // leftover localCheckpoint blocks / persisted frames so 150+
      // gates of accumulation can't pressure later iterative gates
      // (SweepCache fixtures excepted — shared by design)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!SweepCache.isProtected(id)) rdd.unpersist(blocking = false)
      }
      spark.sharedState.cacheManager.clearCache()
    }
    // aux fixtures for two-stage oracles (hash-seeded intermediates the
    // oracle SQL reads back via read_parquet on the expanded {OUT} path).
    // Written to a SIBLING of outDir: the correctness driver enumerates
    // outDir subdirectories as query outputs, and an aux/ subdir inside it
    // shows up as a permanently-red pseudo-query (r2 judge item #2).
    val auxDir = s"${outDir.stripSuffix("/")}.aux"
    SparkEntry.auxOutputs.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$auxDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] aux $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // expand {OUT}/aux to the sibling aux dir so two-stage oracle SQL
    // can read_parquet the fixtures written above ({OUT} alone stays the
    // main outDir for any oracle that reads a query's own output)
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val auxAbs = Paths.get(auxDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .filter(kv => keep(kv._1))
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("{OUT}/aux", auxAbs).replace("{OUT}", outAbs))}"
      }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
