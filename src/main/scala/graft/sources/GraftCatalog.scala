package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `CatalogPlugin`: the generator tables exposed through
  * Spark's catalog API, so plain SQL reaches the custom connector with
  * no `format(...).load()` plumbing —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.GraftCatalog")
  * spark.sql("SELECT count(*) FROM graft.orders10000")
  * }}}
  *
  * Table names are `orders<N>` (N = row count); resolution is pure
  * name parsing, so the catalog is stateless and trivially
  * HA/driver-restart safe. Pushdown, partition planning and the
  * streaming face all come from [[OrdersSource]]'s table — the catalog
  * only routes identifiers, which is exactly the division of labour a
  * metastore-backed catalog has at scale.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName = "graft"
  private val pattern = "orders(\\d+)".r

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  /** `orders<N>` in the root namespace, with N capped at 10⁹ rows —
    * a typo'd identifier like `orders100000000000` must fail at
    * analysis time as an unknown table, not silently plan a ~10¹⁴-row
    * generated scan. Leading zeros are stripped before the cap check so
    * a zero-padded `orders00000000001` resolves like `orders1`; the
    * post-strip length guard keeps `toLong` from throwing a
    * NumberFormatException out of the analyzer. */
  private def rowsOf(ident: Identifier): Option[Long] =
    if (ident.namespace.nonEmpty) None
    else ident.name.toLowerCase match {
      case pattern(n) =>
        val digits = n.dropWhile(_ == '0')
        val rows =
          if (digits.isEmpty) 0L
          else if (digits.length <= 10) digits.toLong
          else Long.MaxValue // over any 10-digit value; fails the cap
        if (rows <= GraftCatalog.MaxRows) Some(rows) else None
      case _ => None
    }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(namespace, "orders1000"),
      Identifier.of(namespace, "sink"), Identifier.of(namespace, "bytes_sink"))
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(catalogName +: namespace)

  override def tableExists(ident: Identifier): Boolean =
    isSink(ident) || isBytesSink(ident) || rowsOf(ident).isDefined

  private def isSink(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name.equalsIgnoreCase("sink")

  private def isBytesSink(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name.equalsIgnoreCase("bytes_sink")

  override def loadTable(ident: Identifier): Table =
    if (isSink(ident)) new GraftSinkTable
    else if (isBytesSink(ident)) new GraftBytesSinkTable
    else rowsOf(ident) match {
      case Some(n) => new OrdersTable(n, parts = 8)
      case None => throw new NoSuchTableException(ident)
    }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
}

object GraftCatalog {
  /** Largest `orders<N>` the catalog resolves; beyond this a name is
    * treated as unknown so fat-finger identifiers fail fast. */
  val MaxRows: Long = 1000000000L
}
