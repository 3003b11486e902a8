package graft.core

import org.apache.spark.sql.types._

/** Typed config model replacing the reference's DynamoDB config store.
  *
  * The reference keeps a per-source list of `services`, each carrying the
  * schema/transformation metadata that drives every pipeline stage
  * (reference: ingestion.py:236-245, transformation.py:457-462,
  * partitioning.py:51-65, loading.py:2001-2005). Here that becomes plain
  * case classes loaded from a JSON resource; on a cluster this file would
  * live next to the job (or in a small Delta config table) and be read once
  * on the driver — it is tiny, so it never touches executors except as
  * literals folded into the plan.
  */
final case class TransformationRule(
    oldColumnName: String,
    finalColumnName: String,
    mappingColumnName: Option[String] = None,
    ruleType: String = "str" // "str" | "dict" (nested extraction)
)

final case class ServiceConfig(
    alias: String,
    serviceName: String = "",
    methodName: String = "",
    version: String = "",
    tableName: String = "",
    transformationRules: Seq[TransformationRule] = Nil,
    transformationColumns: Seq[String] = Nil,
    expandColumns: Seq[String] = Nil,
    expandColumnsTargetingLocation: Seq[String] = Nil,
    expandColumnsCustomField: Seq[String] = Nil,
    reportJobColumns: Seq[String] = Nil,
    maskingCols: Seq[String] = Nil
)

final case class SourceConfig(source: String, services: Seq[ServiceConfig]) {
  def service(alias: String): Option[ServiceConfig] = services.find(_.alias == alias)
}

/** Data-quality rule row (reference: great_expectations.py:208-217 —
  * `streaming_dq_config` with col_name / formatting_rules / Active /
  * process_id, inverted into a rule -> columns map).
  */
final case class DqRule(
    processId: String,
    colName: String,
    formattingRule: String, // e.g. "not_null" | "unique" | "matches:<regex>"
    active: Boolean
)

object Config {

  /** Schema for reading a SourceConfig from JSON with spark.read.json.
    * Field names mirror the reference's DynamoDB item shape
    * (transformation.py:259-283): snake_case keys.
    */
  val sourceConfigJsonSchema: StructType = StructType(
    Seq(
      StructField("source", StringType),
      StructField(
        "services",
        ArrayType(
          StructType(
            Seq(
              StructField("alias", StringType),
              StructField("service_name", StringType),
              StructField("method_name", StringType),
              StructField("version", StringType),
              StructField("table_name", StringType),
              StructField(
                "transformation_rules",
                ArrayType(
                  StructType(
                    Seq(
                      StructField("old_column_name", StringType),
                      StructField("mapping_column_name", StringType),
                      StructField("final_column_name", StringType),
                      StructField("type", StringType)
                    )
                  )
                )
              ),
              StructField("transformation_columns", ArrayType(StringType)),
              StructField("expand_columns", ArrayType(StringType)),
              StructField("expand_columns_targeting_location", ArrayType(StringType)),
              StructField("expand_columns_custom_field", ArrayType(StringType)),
              StructField("report_job_columns", ArrayType(StringType)),
              StructField("masking_cols", ArrayType(StringType))
            )
          )
        )
      )
    )
  )

  /** Load the bundled registry resource (the reference's service registry,
    * re-expressed; src/main/resources/ad_manager_config.json).
    */
  def loadResource(name: String = "/ad_manager_config.json")(implicit spark: org.apache.spark.sql.SparkSession): SourceConfig = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"config resource $name not found")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val json = try src.mkString finally { src.close(); in.close() }
    parse(json)
  }

  /** Parse a SourceConfig from a JSON string (driver-side, tiny). */
  def parse(json: String)(implicit spark: org.apache.spark.sql.SparkSession): SourceConfig = {
    import spark.implicits._
    import org.apache.spark.sql.Row
    val df = spark.read.schema(sourceConfigJsonSchema).json(Seq(json).toDS())
    val row = df.head()
    val source = row.getString(0)
    require(
      !row.isNullAt(1),
      "config JSON has no 'services' array — every source config must declare its services"
    )
    val services = row.getSeq[Row](1).map { s =>
      def str(i: Int): String = Option(s.getString(i)).getOrElse("")
      def strs(i: Int): Seq[String] =
        if (s.isNullAt(i)) Nil else s.getSeq[String](i)
      val rules =
        if (s.isNullAt(5)) Nil
        else
          s.getSeq[Row](5).map { r =>
            TransformationRule(
              oldColumnName = r.getString(0),
              mappingColumnName = Option(r.getString(1)),
              finalColumnName = r.getString(2),
              ruleType = Option(r.getString(3)).getOrElse("str")
            )
          }
      ServiceConfig(
        alias = str(0),
        serviceName = str(1),
        methodName = str(2),
        version = str(3),
        tableName = str(4),
        transformationRules = rules,
        transformationColumns = strs(6),
        expandColumns = strs(7),
        expandColumnsTargetingLocation = strs(8),
        expandColumnsCustomField = strs(9),
        reportJobColumns = strs(10),
        maskingCols = strs(11)
      )
    }
    SourceConfig(source, services)
  }
}
