package graft.operators

import org.apache.spark.sql.types._

/** A18 — recursive `{name, type, mode, fields}` JSON-schema translation
  * (FIXTURES.md §B2; /root/reference/src/utils/bigquery_helper.py:98-107
  * translates the same format to warehouse fields).
  *
  * - `mode` defaults to NULLABLE (bigquery_helper.py:101)
  * - `RECORD` recurses into `fields` (bigquery_helper.py:103-105)
  * - `REPEATED` wraps the element type in `ArrayType`
  * - `JSON` maps to `StringType` (access via `from_json`/
  *   `get_json_object`; SURVEY.md §1.3 table)
  */
object SchemaTranslator {

  /** One `{name,type,mode,fields?}` entry. */
  final case class FieldDef(
      name: String,
      `type`: String,
      mode: Option[String] = None,
      fields: Seq[FieldDef] = Nil)

  private def baseType(fd: FieldDef): DataType = fd.`type`.toUpperCase match {
    case "STRING" | "JSON" => StringType
    case "INTEGER" | "INT64" => LongType
    case "FLOAT" | "FLOAT64" => DoubleType
    case "BOOLEAN" | "BOOL" => BooleanType
    case "TIMESTAMP" => TimestampType
    case "DATE" => DateType
    case "BYTES" => BinaryType
    case "NUMERIC" => DecimalType(38, 9)
    case "RECORD" | "STRUCT" => StructType(fd.fields.map(toField))
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  def toField(fd: FieldDef): StructField = {
    val mode = fd.mode.getOrElse("NULLABLE").toUpperCase
    val dt = baseType(fd)
    mode match {
      case "REPEATED" => StructField(fd.name, ArrayType(dt, containsNull = true), nullable = true)
      case "REQUIRED" => StructField(fd.name, dt, nullable = false)
      case _          => StructField(fd.name, dt, nullable = true)
    }
  }

  def toStruct(fields: Seq[FieldDef]): StructType = StructType(fields.map(toField))

  /** Parse the on-disk file format `{"schema": [field...]}`
    * (/root/reference/src/config/settings.py:47-52). The typed
    * [[FieldDef]] API above is primary; this string entry point exists
    * for parity with the reference's file-driven schema loading.
    */
  def fromJsonString(json: String): StructType = {
    // Jackson ships with Spark — no extra dependency.
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    def node2field(n: JsonNode): FieldDef = FieldDef(
      name = n.get("name").asText(),
      `type` = n.get("type").asText(),
      mode = Option(n.get("mode")).map(_.asText()),
      fields = Option(n.get("fields")).map(f =>
        (0 until f.size()).map(f.get).map(node2field).toSeq).getOrElse(Nil))
    val arr = root.get("schema")
    toStruct((0 until arr.size()).map(arr.get).map(node2field).toSeq)
  }

  /** The `message_history` DDL — the one full table schema in the
    * reference (FIXTURES.md §B3; /root/reference/src/utils/
    * bigquery_helper.py:61-92). Day-partitioned on `sent_at`, clustered
    * `(campaign_type, status)` → in Spark: partitionBy(date) +
    * sortWithinPartitions (see IngestOps.writePartitioned). */
  val messageHistory: StructType = toStruct(Seq(
    FieldDef("message_id", "STRING", Some("REQUIRED")),
    FieldDef("user_id", "STRING", Some("REQUIRED")),
    FieldDef("campaign_id", "STRING"),
    FieldDef("campaign_type", "STRING", Some("REQUIRED")),
    FieldDef("message_content", "STRING", Some("REQUIRED")),
    FieldDef("phone", "STRING", Some("REQUIRED")),
    FieldDef("status", "STRING", Some("REQUIRED")),
    FieldDef("error_message", "STRING"),
    FieldDef("template_name", "STRING"),
    FieldDef("template_language", "STRING"),
    FieldDef("template_variables", "JSON"),
    FieldDef("sent_at", "TIMESTAMP", Some("REQUIRED")),
    FieldDef("delivered_at", "TIMESTAMP"),
    FieldDef("read_at", "TIMESTAMP"),
    FieldDef("customer_response", "STRING"),
    FieldDef("response_timestamp", "TIMESTAMP"),
    FieldDef("whatsapp_message_id", "STRING"),
    FieldDef("whatsapp_status", "STRING"),
    FieldDef("retry_count", "INTEGER", Some("REQUIRED")),
    FieldDef("created_at", "TIMESTAMP", Some("REQUIRED")),
    FieldDef("updated_at", "TIMESTAMP", Some("REQUIRED")),
  ))
}
