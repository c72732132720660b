package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Namespace-aware table binding (SURVEY.md S5): the reference's `MRUtil`
 * exists solely to make `ns:table` identifiers resolve; here the identifier
 * handling is a parser + a warehouse layout. Accepts both HBase-shell
 * (`ns:table`) and SQL (`ns.table`) spellings; a bare name lands in the
 * `default` namespace.
 *
 * Storage is one parquet directory per table under the warehouse root —
 * the seam where a real connector plugs in at cluster scale.
 */
object Catalog {

  final case class Ident(namespace: String, table: String) {
    override def toString: String = s"$namespace:$table"
  }

  def parse(ident: String): Ident = {
    val trimmed = ident.trim
    require(trimmed.nonEmpty, "empty table identifier")
    val sep = trimmed.indexWhere(c => c == ':' || c == '.')
    if (sep < 0) Ident("default", trimmed)
    else {
      val (ns, rest) = (trimmed.substring(0, sep), trimmed.substring(sep + 1))
      require(ns.nonEmpty && rest.nonEmpty, s"malformed table identifier '$ident'")
      Ident(ns, rest)
    }
  }

  def warehouseDir: String =
    sys.props.get("graft.warehouse")
      .orElse(sys.env.get("GRAFT_WAREHOUSE"))
      .getOrElse("/tmp/graft_warehouse")

  def path(ident: Ident): String = s"$warehouseDir/${ident.namespace}/${ident.table}"

  def load(spark: SparkSession, ident: String): DataFrame =
    spark.read.parquet(path(parse(ident)))

  def save(df: DataFrame, ident: String, mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).parquet(path(parse(ident)))

  def exists(spark: SparkSession, ident: String): Boolean =
    new java.io.File(path(parse(ident))).exists()
}
