package graft.model

import org.apache.spark.sql.types._

/** Foreign-key reference: `column` in this table points at
  * `refTable.refColumn`. The reference resolves FK parents positionally
  * (first column of the parent table, data_quality_checker.py:140); we
  * diverge deliberately and use the declared target column.
  */
final case class FkRef(column: String, refTable: String, refColumn: String)

/** One column of a declared table schema. Mirrors the information the
  * reference carries per SQLAlchemy `Column` (etl2.py:63-203): name, type,
  * primary-key membership, server defaults (`updated_at` CURRENT_TIMESTAMP,
  * etl2.py:111) and literal defaults (`is_deleted=False`, etl2.py:112).
  */
final case class ColumnSpec(
    name: String,
    dataType: DataType,
    nullable: Boolean = true,
    primaryKey: Boolean = false,
    defaultNow: Boolean = false,
    defaultValue: Option[Any] = None
)

/** Declarative table config — the Spark-side equivalent of the reference's
  * `tables_config` dict (etl2.py:63-203). Drives schema validation, FK
  * checks, DDL generation, and merge/SCD2 key selection.
  */
final case class TableConfig(
    name: String,
    columns: Seq[ColumnSpec],
    foreignKeys: Seq[FkRef] = Nil
) {
  def primaryKey: Seq[String] = columns.filter(_.primaryKey).map(_.name)

  def schema: StructType =
    StructType(columns.map(c => StructField(c.name, c.dataType, c.nullable)))

  def columnNames: Seq[String] = columns.map(_.name)

  /** Business payload columns: everything except merge bookkeeping. */
  def payloadColumns: Seq[String] =
    columnNames.filterNot(Set("updated_at", "is_deleted"))

  /** `CREATE TABLE IF NOT EXISTS` DDL (S9, etl2.py:262-267). */
  def ddl: String = {
    val cols = columns.map { c =>
      val t = c.dataType.sql
      val pk = "" // PK emitted as table constraint below
      s"  ${c.name} $t$pk"
    }
    val pkClause =
      if (primaryKey.nonEmpty) Seq(s"  PRIMARY KEY (${primaryKey.mkString(", ")})")
      else Nil
    s"CREATE TABLE IF NOT EXISTS $name (\n${(cols ++ pkClause).mkString(",\n")}\n)"
  }
}

object TableConfig {

  /** Topological sort of configs so parents load before children
    * (T6, etl2.py:418-430 hard-codes the order; we derive it from the
    * declared FK graph instead).
    */
  def fkOrdered(configs: Seq[TableConfig]): Seq[TableConfig] = {
    val byName = configs.map(c => c.name -> c).toMap
    val visited = scala.collection.mutable.LinkedHashSet[String]()
    def visit(n: String, stack: Set[String]): Unit = {
      if (!visited.contains(n) && !stack.contains(n)) {
        byName.get(n).foreach { cfg =>
          cfg.foreignKeys.map(_.refTable).filter(_ != n)
            .foreach(visit(_, stack + n))
        }
        if (byName.contains(n)) visited += n
      }
    }
    configs.foreach(c => visit(c.name, Set.empty))
    visited.toSeq.map(byName)
  }
}

/** The reference's 13-table Olist schema (etl2.py:63-203), re-declared as
  * `TableConfig`s. Used by rule unit tests; the driver test data
  * (TPC-H-ish) has its own configs in `TestdataSchema`.
  */
object OlistSchema {
  import DataTypes._
  private val S = StringType
  private val I = IntegerType
  private val D = DoubleType
  private val T = TimestampType
  private val B = BooleanType

  private def c(n: String, t: DataType, pk: Boolean = false) =
    ColumnSpec(n, t, primaryKey = pk)

  val categoryTranslation: TableConfig = TableConfig(
    "product_category_name_translation",
    Seq(c("product_category_name", S, pk = true),
        c("product_category_name_english", S)))

  val customers: TableConfig = TableConfig(
    "customers",
    Seq(c("customer_id", S, pk = true), c("customer_unique_id", S),
        c("customer_zip_code_prefix", I), c("customer_city", S),
        c("customer_state", S)))

  val orders: TableConfig = TableConfig(
    "orders",
    Seq(c("order_id", S, pk = true), c("customer_id", S), c("order_status", S),
        c("order_purchase_timestamp", T), c("order_approved_at", T),
        c("order_delivered_carrier_date", T),
        c("order_delivered_customer_date", T),
        c("order_estimated_delivery_date", T)),
    Seq(FkRef("customer_id", "customers", "customer_id")))

  val products: TableConfig = TableConfig(
    "products",
    Seq(c("product_id", S, pk = true), c("product_category_name", S),
        c("product_name_lenght", I), c("product_description_lenght", I),
        c("product_photos_qty", I), c("product_weight_g", I),
        c("product_length_cm", I), c("product_height_cm", I),
        c("product_width_cm", I),
        ColumnSpec("updated_at", T, defaultNow = true),
        ColumnSpec("is_deleted", B, defaultValue = Some(false))),
    Seq(FkRef("product_category_name", "product_category_name_translation",
              "product_category_name")))

  val productsHistory: TableConfig = TableConfig(
    "products_history",
    Seq(c("product_id", S, pk = true), c("product_category_name", S),
        c("product_name_lenght", I), c("product_description_lenght", I),
        c("product_photos_qty", I), c("product_weight_g", I),
        c("product_length_cm", I), c("product_height_cm", I),
        c("product_width_cm", I), c("is_deleted", B),
        c("valid_from", T, pk = true), c("valid_to", T, pk = true)))

  val sellers: TableConfig = TableConfig(
    "sellers",
    Seq(c("seller_id", S, pk = true), c("seller_zip_code_prefix", I),
        c("seller_city", S), c("seller_state", S),
        ColumnSpec("updated_at", T, defaultNow = true),
        ColumnSpec("is_deleted", B, defaultValue = Some(false))))

  val sellersHistory: TableConfig = TableConfig(
    "sellers_history",
    Seq(c("seller_id", S, pk = true), c("seller_zip_code_prefix", I),
        c("seller_city", S), c("seller_state", S), c("is_deleted", B),
        c("valid_from", T, pk = true), c("valid_to", T, pk = true)))

  val orderItems: TableConfig = TableConfig(
    "order_items",
    Seq(c("order_id", S, pk = true), c("order_item_id", I, pk = true),
        c("product_id", S, pk = true), c("seller_id", S),
        c("shipping_limit_date", T), c("price", D), c("freight_value", D)),
    Seq(FkRef("order_id", "orders", "order_id"),
        FkRef("product_id", "products", "product_id")))

  val orderPayments: TableConfig = TableConfig(
    "order_payments",
    Seq(c("order_id", S, pk = true), c("payment_sequential", I, pk = true),
        c("payment_type", S), c("payment_installments", I),
        c("payment_value", D)),
    Seq(FkRef("order_id", "orders", "order_id")))

  val orderReviews: TableConfig = TableConfig(
    "order_reviews",
    Seq(c("review_id", S, pk = true), c("order_id", S, pk = true),
        c("review_score", I), c("review_comment_title", S),
        c("review_comment_message", S), c("review_creation_date", T),
        c("review_answer_timestamp", T)),
    Seq(FkRef("order_id", "orders", "order_id")))

  val geoCityState: TableConfig = TableConfig(
    "geo_city_state",
    Seq(c("city_id", I, pk = true), c("city", S), c("state", S)))

  val geoZip: TableConfig = TableConfig(
    "geo_zip",
    Seq(c("zip_code", I, pk = true), c("city_id", I)),
    Seq(FkRef("city_id", "geo_city_state", "city_id")))

  val geoCoordinates: TableConfig = TableConfig(
    "geo_coordinates",
    Seq(c("zip_code", I), c("longitude", D, pk = true),
        c("latitude", D, pk = true)),
    Seq(FkRef("zip_code", "geo_zip", "zip_code")))

  val all: Seq[TableConfig] = Seq(
    categoryTranslation, customers, orders, products, productsHistory,
    sellers, sellersHistory, orderItems, orderPayments, orderReviews,
    geoCityState, geoZip, geoCoordinates)
}
