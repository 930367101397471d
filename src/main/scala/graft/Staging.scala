package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped staging directories for operator-internal artifacts.
  *
  * Staged artifacts (the incremental-dedup digest store, the persisted
  * IVFPQ index, connector sink/checkpoint dirs, compaction inputs, JSONL
  * round-trip exports) used to live under FIXED `java.io.tmpdir` paths
  * keyed only by the dataset dir — deterministic and reusable within one
  * process, but two concurrent sessions on one machine running against the
  * same dataset raced overwrite-vs-read on the shared paths, yielding
  * nondeterministic failures or wrong rows. Scoping the root by the Spark
  * application id keeps the within-session determinism (the id is stable
  * for the session's life, so repeated invocations of one query reuse and
  * overwrite their own artifact — the bench warm-up/timed-run contract)
  * while making cross-process collision impossible: every session gets a
  * distinct id.
  *
  * The app-scoped root is deleted when the application ends (a listener is
  * registered on first use per session), so abandoned staging trees do not
  * accumulate across sessions the way the fixed scheme's overwrite
  * discipline used to bound them.
  */
object Staging {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** `tmpdir/graft-stage/<applicationId>/<label>`; `label` is the caller's
    * key — operator family plus a dataset-derived leaf.
    */
  def dir(s: SparkSession, label: String): String = {
    val appId = s.sparkContext.applicationId
    val root =
      s"${System.getProperty("java.io.tmpdir")}/graft-stage/$appId"
    if (registered.add(appId)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit =
          deleteRecursively(new java.io.File(root))
      })
    }
    s"$root/$label"
  }

  /** Short content digest of a dataset path — the per-dataset leaf that
    * keeps two datasets' artifacts apart inside one session's root.
    */
  def datasetLeaf(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
