package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM.
  *
  * `local[4, 3]` = 4 executor threads, up to 3 attempts per task — retries on
  * so the crash-chaos suite can exercise the reference's re-execution
  * semantics (`spark.task.maxFailures` is fixed at context construction in
  * local mode via the master string).
  */
object TestSpark {
  private var _spark: SparkSession = null

  /** Rebuilds if a suite (e.g. the local-cluster chaos soak, which needs its
    * own multi-process SparkContext) stopped the shared session.
    */
  def spark: SparkSession = synchronized {
    if (_spark == null || _spark.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      _spark = SparkSession.builder()
        .master("local[4, 3]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
        .getOrCreate()
    }
    _spark
  }

  /** Reference pg corpus (read-only fixtures; FIXTURES.md §A.1). */
  val PgGlob = "/root/reference/src/main/pg-*.txt"
  /** Committed goldens from the reference's own test run (FIXTURES.md §A.4). */
  val IndexerGolden = "/root/reference/src/main/mr-tmp/mr-indexer-all"
  val NocrashGolden = "/root/reference/src/main/mr-tmp/mr-correct-crash.txt"

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
