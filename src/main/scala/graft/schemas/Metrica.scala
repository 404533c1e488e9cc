package graft.schemas

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** The reference's two Metrica tables as explicit Spark schemas,
  * transcribed field-for-field from `/root/reference/ddl/hits.sql:5-110`
  * (106 columns) and `/root/reference/ddl/visits.sql:5-227` (224
  * columns, including the two-columns-on-one-line pair at :227).
  *
  * Type mapping (SURVEY.md §1.2): unsigned ints widen one level
  * (UInt8→Short, UInt16→Int, UInt32→Long); UInt64 hash/ID columns map
  * to LongType as a bit-preserving reinterpret (they are only grouped,
  * joined and counted, never rendered as numbers); FixedString(2)
  * country/lang codes map to String; FixedString(16) is a raw IPv6 as
  * 16 bytes → Binary; Date→Date, DateTime→Timestamp (UTC session TZ);
  * `Group.Field` parallel arrays keep their literal dotted names
  * (backtick-addressable in Spark, roundtrip-faithful to the DDL).
  *
  * Physical layout (ddl/hits.sql:112-120, ddl/visits.sql:229-240):
  * PARTITION BY toMonday(date) → week-partitioned Parquet via
  * [[graft.sources.Warehouse]]; ORDER BY clustering keys below →
  * sortWithinPartitions (Parquet page min/max stats play the role of
  * the MergeTree sparse index); SAMPLE BY CounterUserIDHash →
  * Relational.sampleByHash on [[sampleKey]].
  */
object Metrica {

  /** ORDER BY of hits (ddl/hits.sql:115-118). */
  val hitsOrderKey: Seq[String] =
    Seq("CounterID", "EventDate", "CounterUserIDHash", "UTCEventTime")

  /** ORDER BY of visits (ddl/visits.sql:235-238). */
  val visitsOrderKey: Seq[String] =
    Seq("CounterID", "StartDate", "CounterUserIDHash", "VisitID")

  /** SAMPLE BY key of both tables (ddl/hits.sql:119, ddl/visits.sql:239). */
  val sampleKey: String = "CounterUserIDHash"

  /** Partition date columns (PARTITION BY toMonday(...)). */
  val hitsPartitionDate: String = "EventDate"
  val visitsPartitionDate: String = "StartDate"

  /** Conform a frame holding a SUBSET of a schema's columns to the full
    * schema: missing columns become typed nulls, order follows the
    * schema. The engine's form of the reference's schema-clone
    * `CREATE TABLE ... AS hits_<id>` (README.md:138, J3).
    */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.map(n => n -> df.schema(n).dataType).toMap
    df.select(schema.fields.toSeq.map { f =>
      val c: Column = have.get(f.name) match {
        // Spark refuses to cast away element nullability (array<string>
        // -> array<string containsNull=false>), so cast to the
        // nullability-relaxed target and skip the cast when the types
        // already match up to nullability.
        case Some(src) if relax(src) == relax(f.dataType) => col(s"`${f.name}`")
        case Some(_) => col(s"`${f.name}`").cast(relax(f.dataType))
        case None => lit(null).cast(relax(f.dataType))
      }
      c.as(f.name)
    }: _*)
  }

  /** Nested view of a parallel-array group (SURVEY §7.3): zips the
    * flat `Group.Field` columns into ONE `Group: array<struct<Field…>>`
    * column — CH Nested ergonomics (`TrafficSource[1].UTMSource`)
    * without changing the storage layout, which stays flat and
    * roundtrip-faithful to the reference DDL. The zip is positional,
    * exactly the Nested contract (parallel arrays share their index).
    */
  def nested(df: DataFrame, group: String): DataFrame = {
    import org.apache.spark.sql.functions.{arrays_zip, array, coalesce}
    val members = df.columns.filter(_.startsWith(group + "."))
    require(members.nonEmpty, s"no $group.* columns to nest")
    df.withColumn(group,
      arrays_zip(members.toSeq.map { c =>
        // a NULL member (e.g. a conform-filled absent column) must act
        // as an empty array — arrays_zip would otherwise null the
        // whole zipped group
        coalesce(col(s"`$c`"), array().cast(df.schema(c).dataType))
          .as(c.stripPrefix(group + "."))
      }: _*))
  }

  private def relax(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(relax(e), containsNull = true)
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = relax(f.dataType), nullable = true)))
    case other => other
  }

  val hits: StructType = StructType(Seq(
    StructField("CounterID", LongType, nullable = false),
    StructField("EventDate", DateType, nullable = false),
    StructField("CounterUserIDHash", LongType, nullable = false),
    StructField("UTCEventTime", TimestampType, nullable = false),
    StructField("WatchID", LongType, nullable = false),
    StructField("AdvEngineID", ShortType, nullable = true),
    StructField("AdvEngineStrID", StringType, nullable = true),
    StructField("BrowserCountry", StringType, nullable = true),
    StructField("BrowserEngineID", ShortType, nullable = true),
    StructField("BrowserEngineStrID", StringType, nullable = true),
    StructField("BrowserEngineVersion1", IntegerType, nullable = true),
    StructField("BrowserEngineVersion2", IntegerType, nullable = true),
    StructField("BrowserEngineVersion3", IntegerType, nullable = true),
    StructField("BrowserEngineVersion4", IntegerType, nullable = true),
    StructField("BrowserLanguage", StringType, nullable = true),
    StructField("CLID", LongType, nullable = true),
    StructField("ClientIP", LongType, nullable = true),
    StructField("ClientIP6", BinaryType, nullable = true),
    StructField("ClientTimeZone", ShortType, nullable = true),
    StructField("CookieEnable", ShortType, nullable = true),
    StructField("DevicePixelRatio", FloatType, nullable = true),
    StructField("DirectCLID", LongType, nullable = true),
    StructField("FirstPartyCookie", LongType, nullable = true),
    StructField("FromTag", StringType, nullable = true),
    StructField("GCLID", StringType, nullable = true),
    StructField("GoalsReached", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("HasGCLID", ShortType, nullable = true),
    StructField("HTTPError", IntegerType, nullable = true),
    StructField("IsArtifical", ShortType, nullable = true),
    StructField("IsDownload", ShortType, nullable = true),
    StructField("IsIFrame", ShortType, nullable = true),
    StructField("IsLink", ShortType, nullable = true),
    StructField("IsMobile", ShortType, nullable = true),
    StructField("IsNotBounce", ShortType, nullable = true),
    StructField("IsPageView", ShortType, nullable = true),
    StructField("IsParameter", ShortType, nullable = true),
    StructField("IsTablet", ShortType, nullable = true),
    StructField("IsTV", ShortType, nullable = true),
    StructField("JavascriptEnable", ShortType, nullable = true),
    StructField("MessengerID", ShortType, nullable = true),
    StructField("MessengerStrID", StringType, nullable = true),
    StructField("MobilePhoneModel", StringType, nullable = true),
    StructField("MobilePhoneVendor", IntegerType, nullable = true),
    StructField("MobilePhoneVendorStr", StringType, nullable = true),
    StructField("NetworkType", ShortType, nullable = true),
    StructField("NetworkTypeStr", StringType, nullable = true),
    StructField("OpenstatAdID", StringType, nullable = true),
    StructField("OpenstatCampaignID", StringType, nullable = true),
    StructField("OpenstatServiceName", StringType, nullable = true),
    StructField("OpenstatSourceID", StringType, nullable = true),
    StructField("OriginalURL", StringType, nullable = true),
    StructField("OS", ShortType, nullable = true),
    StructField("OSFamily", StringType, nullable = true),
    StructField("OSName", StringType, nullable = true),
    StructField("OSRoot", ShortType, nullable = true),
    StructField("OSRootStr", StringType, nullable = true),
    StructField("OSStr", StringType, nullable = true),
    StructField("PageCharset", StringType, nullable = true),
    StructField("ParsedParams.Key1", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key10", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key2", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key3", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key4", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key5", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key6", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key7", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key8", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key9", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Quantity", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("QRCodeProviderID", IntegerType, nullable = true),
    StructField("QRCodeProviderStrID", StringType, nullable = true),
    StructField("RecommendationSystemID", ShortType, nullable = true),
    StructField("RecommendationSystemStrID", StringType, nullable = true),
    StructField("Referer", StringType, nullable = true),
    StructField("RegionID", LongType, nullable = true),
    StructField("ResolutionDepth", ShortType, nullable = true),
    StructField("ResolutionHeight", IntegerType, nullable = true),
    StructField("ResolutionWidth", IntegerType, nullable = true),
    StructField("SearchEngineID", IntegerType, nullable = true),
    StructField("SearchEngineRootID", IntegerType, nullable = true),
    StructField("SearchEngineRootStrID", StringType, nullable = true),
    StructField("SearchEngineStrID", StringType, nullable = true),
    StructField("ShareService", StringType, nullable = true),
    StructField("ShareTitle", StringType, nullable = true),
    StructField("ShareURL", StringType, nullable = true),
    StructField("SocialSourceNetworkID", ShortType, nullable = true),
    StructField("SocialSourceNetworkStrID", StringType, nullable = true),
    StructField("SocialSourcePage", StringType, nullable = true),
    StructField("Title", StringType, nullable = true),
    StructField("TrafficSourceID", ByteType, nullable = true),
    StructField("TrafficSourceStrID", StringType, nullable = true),
    StructField("URL", StringType, nullable = true),
    StructField("UserAgent", ShortType, nullable = true),
    StructField("UserAgentMajor", IntegerType, nullable = true),
    StructField("UserAgentStr", StringType, nullable = true),
    StructField("UserAgentVersion2", LongType, nullable = true),
    StructField("UserAgentVersion3", LongType, nullable = true),
    StructField("UserAgentVersion4", LongType, nullable = true),
    StructField("UTMCampaign", StringType, nullable = true),
    StructField("UTMContent", StringType, nullable = true),
    StructField("UTMMedium", StringType, nullable = true),
    StructField("UTMSource", StringType, nullable = true),
    StructField("UTMTerm", StringType, nullable = true),
    StructField("WindowClientHeight", IntegerType, nullable = true),
    StructField("WindowClientWidth", IntegerType, nullable = true),
    StructField("YQRID", StringType, nullable = true),
  ))

  val visits: StructType = StructType(Seq(
    StructField("CounterID", LongType, nullable = false),
    StructField("StartDate", DateType, nullable = false),
    StructField("CounterUserIDHash", LongType, nullable = false),
    StructField("VisitID", LongType, nullable = false),
    StructField("Sign", ByteType, nullable = false),
    StructField("VisitVersion", LongType, nullable = false),
    StructField("BrowserCountry", IntegerType, nullable = true),
    StructField("BrowserEngineID", ShortType, nullable = true),
    StructField("BrowserEngineStrID", StringType, nullable = true),
    StructField("BrowserEngineVersion1", IntegerType, nullable = true),
    StructField("BrowserEngineVersion2", IntegerType, nullable = true),
    StructField("BrowserEngineVersion3", IntegerType, nullable = true),
    StructField("BrowserEngineVersion4", IntegerType, nullable = true),
    StructField("BrowserLanguage", IntegerType, nullable = true),
    StructField("CDPOrder.Cost", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("CDPOrder.CreateTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("CDPOrder.ID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("CDPOrder.ProductNames", ArrayType(ArrayType(StringType, containsNull = false), containsNull = false), nullable = false),
    StructField("CDPOrder.ProductQuantities", ArrayType(ArrayType(LongType, containsNull = false), containsNull = false), nullable = false),
    StructField("CDPOrder.Revenue", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("CDPOrder.Status", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("CDPOrder.UpdateTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("CDPOrder.UserID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("CDPOrder.Version", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("ClientIP", LongType, nullable = true),
    StructField("ClientIP6", BinaryType, nullable = true),
    StructField("ClientTimeZone", ShortType, nullable = true),
    StructField("CookieEnable", ShortType, nullable = true),
    StructField("DevicePixelRatio", FloatType, nullable = true),
    StructField("Duration", LongType, nullable = true),
    StructField("EAction.EventTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("EAction.ProductBrand", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCategory", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCategory1", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCategory2", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCategory3", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCategory4", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCategory5", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCoupon", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCurrency", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductCurrencyID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("EAction.ProductID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductList", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductName", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.ProductPosition", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("EAction.ProductPrice", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EAction.ProductQuantity", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EAction.ProductVariant", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.Type", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("EAction.TypeStr", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EAction.URL", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EActionOverflow", ShortType, nullable = true),
    StructField("EndURL", StringType, nullable = true),
    StructField("EPurchase.Affiliation", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchase.Coupon", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchase.Currency", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchase.CurrencyID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("EPurchase.EventTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("EPurchase.ID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchase.ProductQuantity", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchase.Revenue", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchase.Shipping", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchase.Tax", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchaseOverflow", ShortType, nullable = true),
    StructField("EPurchaseWithProducts.Affiliation", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.Coupon", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.Currency", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.CurrencyID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.EventTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductBrand", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCategory", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCategory1", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCategory2", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCategory3", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCategory4", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCategory5", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCoupon", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCurrency", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductCurrencyID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductList", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductName", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductPosition", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductPrice", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.ProductVariant", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.Quantity", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.Revenue", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.Shipping", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProducts.Tax", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("EPurchaseWithProductsOverflow", ShortType, nullable = true),
    StructField("FirstPartyCookie", LongType, nullable = true),
    StructField("FirstVisit", TimestampType, nullable = true),
    StructField("Goals.CallFirstTimeCaller", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.CallHoldDuration", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.CallMissed", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.CallTag", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("Goals.CallTalkDuration", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.CallTrackerURL", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("Goals.CallURL", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("Goals.CurrencyID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.EventTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("Goals.ID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.OrderID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("Goals.Price", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("Goals.Serial", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("HasGoalReachesOverflow", ShortType, nullable = true),
    StructField("IsBounce", ShortType, nullable = true),
    StructField("IsMobile", ShortType, nullable = true),
    StructField("IsTablet", ShortType, nullable = true),
    StructField("IsTV", ShortType, nullable = true),
    StructField("JavascriptEnable", ShortType, nullable = true),
    StructField("LinkURL", StringType, nullable = true),
    StructField("MobilePhoneModel", StringType, nullable = true),
    StructField("MobilePhoneVendor", IntegerType, nullable = true),
    StructField("MobilePhoneVendorStr", StringType, nullable = true),
    StructField("NetworkType", ShortType, nullable = true),
    StructField("NetworkTypeStr", StringType, nullable = true),
    StructField("OS", ShortType, nullable = true),
    StructField("OSFamily", StringType, nullable = true),
    StructField("OSName", StringType, nullable = true),
    StructField("OSRoot", ShortType, nullable = true),
    StructField("OSRootStr", StringType, nullable = true),
    StructField("OSStr", StringType, nullable = true),
    StructField("PageViews", IntegerType, nullable = true),
    StructField("ParsedParams.Key1", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key10", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key2", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key3", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key4", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key5", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key6", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key7", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key8", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Key9", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ParsedParams.Quantity", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.AdvEngineID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.AdvEngineStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.ArticleHeight", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.ArticleID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.Authors", ArrayType(ArrayType(StringType, containsNull = false), containsNull = false), nullable = false),
    StructField("PublisherEvents.Chars", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.EventID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.FromArticleID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.HasRecircled", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.HitEventTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("PublisherEvents.InvolvedTime", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("PublisherEvents.MessengerID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.MessengerStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.PublicationTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("PublisherEvents.RecommendationSystemID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.RecommendationSystemStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.ReferrerDomain", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.ReferrerPath", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.Rubric", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.Rubric2", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.ScrollDown", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.SearchEngineID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("PublisherEvents.SearchEngineStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.SocialSourceNetworkID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.SocialSourceNetworkStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.Title", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.Topics", ArrayType(ArrayType(StringType, containsNull = false), containsNull = false), nullable = false),
    StructField("PublisherEvents.TrafficSourceID", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("PublisherEvents.TrafficSourceStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.TurboType", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("PublisherEvents.TurboTypeStr", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("PublisherEvents.URLCanonical", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("Referer", StringType, nullable = true),
    StructField("RegionID", LongType, nullable = true),
    StructField("ResolutionDepth", ShortType, nullable = true),
    StructField("ResolutionHeight", IntegerType, nullable = true),
    StructField("ResolutionWidth", IntegerType, nullable = true),
    StructField("StartURL", StringType, nullable = true),
    StructField("TrafficSource.AdvEnginePlaceID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("TrafficSource.AdvEnginePlaceStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.ClickBannerID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("TrafficSource.ClickDirectCampaignID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("TrafficSource.ClickGroupBannerID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("TrafficSource.ClickTargetType", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("TrafficSource.CLID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("TrafficSource.DirectCLID", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("TrafficSource.Domain", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.FromTag", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.GCLID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.HasGCLID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("TrafficSource.ID", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("TrafficSource.MessengerID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("TrafficSource.MessengerStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.Model", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("TrafficSource.ModelStr", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.OpenstatAdID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.OpenstatCampaignID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.OpenstatServiceName", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.OpenstatSourceID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.QRCodeProviderID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("TrafficSource.QRCodeProviderStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.RecommendationSystemID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("TrafficSource.RecommendationSystemStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.SearchEngineID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("TrafficSource.SearchEngineRootID", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("TrafficSource.SearchEngineRootStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.SearchEngineStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.SocialSourceNetworkID", ArrayType(ShortType, containsNull = false), nullable = false),
    StructField("TrafficSource.SocialSourceNetworkStrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.SocialSourcePage", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.StartTime", ArrayType(TimestampType, containsNull = false), nullable = false),
    StructField("TrafficSource.StrID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.UTMCampaign", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.UTMContent", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.UTMMedium", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.UTMSource", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.UTMTerm", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("TrafficSource.YQRID", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("UserAgent", ShortType, nullable = true),
    StructField("UserAgentMajor", IntegerType, nullable = true),
    StructField("UserAgentStr", StringType, nullable = true),
    StructField("UserAgentVersion2", LongType, nullable = true),
    StructField("UserAgentVersion3", LongType, nullable = true),
    StructField("UserAgentVersion4", LongType, nullable = true),
    StructField("UTCStartTime", TimestampType, nullable = true),
    StructField("WatchIDs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("WindowClientHeight", IntegerType, nullable = true),
    StructField("WindowClientWidth", IntegerType, nullable = true),
  ))
}
