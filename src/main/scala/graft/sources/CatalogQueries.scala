package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate queries exercising the [[org.apache.spark.sql.graftshim.GraftCatalog]]
  * V2 catalog plugin — the three-part-name SQL surface over the parquet
  * lake. See the catalog's scaladoc for the layout contract.
  */
object CatalogQueries {

  /** Registers (idempotently) a catalog instance whose name encodes the
    * lake root, so different roots in one session (smoke at sf0.001,
    * verify at sf0.01) never fight over a cached catalog's `root` option —
    * Spark caches catalog instances per name, and `initialize` runs once.
    * Returns (catalogName, namespace) for the given scale dir.
    */
  def register(s: SparkSession, dir: String): (String, String) = {
    val f = new java.io.File(dir).getCanonicalFile
    val root = f.getParent
    // the lake layout is <root>/<sf-namespace>/<table>.parquet, so the
    // scale dir must have a parent — a filesystem-root dir can't be a
    // namespace (and getParent == null would NPE below)
    require(root != null,
      s"catalog register: '$dir' resolves to filesystem root '$f' — " +
        "expected <lakeRoot>/<namespace> (e.g. /root/testdata/sf0.01)")
    val ns = f.getName.replace('.', '_')
    // the catalog name carries an md5 of the raw root (injective, and
    // constant-length regardless of path depth) plus a short readable
    // basename tail — two distinct roots can never collide onto one
    // cached catalog instance, and deep roots don't yield huge conf keys
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val tail = new java.io.File(root).getName.replaceAll("[^A-Za-z0-9]", "_")
    val cat = "graft_lake_" + tail + "_" + digest
    s.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.graftshim.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, ns)
  }

  /** catalog_agg — an aggregation addressed ENTIRELY through the catalog
    * (no spark.read anywhere): proves a SQL-only consumer reaches the same
    * vectorized parquet scan, with grouping/pushdown intact, via
    * `catalog.namespace.table` names. The oracle is the same SQL over the
    * raw parquet — the catalog must be a pure naming layer.
    */
  def catalogAgg(s: SparkSession, dir: String): DataFrame = {
    val (cat, ns) = register(s, dir)
    s.sql(
      s"""SELECT l_returnflag, count(*) AS n_lines,
         |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
         |FROM $cat.$ns.lineitem
         |GROUP BY l_returnflag""".stripMargin)
  }
}
