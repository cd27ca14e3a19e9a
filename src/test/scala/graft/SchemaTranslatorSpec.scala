package graft

import graft.operators.SchemaTranslator
import graft.operators.SchemaTranslator.FieldDef
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaTranslatorSpec extends AnyFunSuite {

  test("scalar types and modes") {
    assert(SchemaTranslator.toField(FieldDef("a", "STRING")) ===
      StructField("a", StringType, nullable = true))
    assert(SchemaTranslator.toField(FieldDef("b", "INTEGER", Some("REQUIRED"))) ===
      StructField("b", LongType, nullable = false))
    assert(SchemaTranslator.toField(FieldDef("c", "TIMESTAMP", Some("NULLABLE"))) ===
      StructField("c", TimestampType, nullable = true))
    // JSON maps to string (accessed via from_json/get_json_object)
    assert(SchemaTranslator.toField(FieldDef("d", "JSON")).dataType === StringType)
  }

  test("default mode is NULLABLE (bigquery_helper.py:101 behavior)") {
    assert(SchemaTranslator.toField(FieldDef("x", "FLOAT")).nullable)
  }

  test("REPEATED wraps in ArrayType") {
    val f = SchemaTranslator.toField(FieldDef("xs", "INTEGER", Some("REPEATED")))
    assert(f.dataType === ArrayType(LongType, containsNull = true))
  }

  test("nested RECORD recurses (bigquery_helper.py:103-105 behavior)") {
    val f = SchemaTranslator.toField(FieldDef("r", "RECORD", Some("REQUIRED"), Seq(
      FieldDef("inner", "STRING", Some("REQUIRED")),
      FieldDef("deep", "RECORD", None, Seq(FieldDef("leaf", "INTEGER"))))))
    val expected = StructType(Seq(
      StructField("inner", StringType, nullable = false),
      StructField("deep", StructType(Seq(StructField("leaf", LongType))), nullable = true)))
    assert(f === StructField("r", expected, nullable = false))
  }

  test("message_history DDL has 21 columns with documented modes") {
    val mh = SchemaTranslator.messageHistory
    assert(mh.fields.length === 21)
    assert(!mh("message_id").nullable)
    assert(mh("campaign_id").nullable)
    assert(mh("sent_at").dataType === TimestampType)
    assert(!mh("retry_count").nullable && mh("retry_count").dataType === LongType)
  }

  test("fromJsonString parses the {schema: [...]} file format") {
    val json = """{"schema": [
      {"name": "id", "type": "INTEGER", "mode": "REQUIRED"},
      {"name": "payload", "type": "RECORD", "fields": [
        {"name": "k", "type": "STRING"}]},
      {"name": "tags", "type": "STRING", "mode": "REPEATED"}]}"""
    val st = SchemaTranslator.fromJsonString(json)
    assert(st.fields.length === 3)
    assert(st("id") === StructField("id", LongType, nullable = false))
    assert(st("payload").dataType === StructType(Seq(StructField("k", StringType))))
    assert(st("tags").dataType === ArrayType(StringType, containsNull = true))
  }
}
