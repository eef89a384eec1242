package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins the column types the engine assumes about the driver-generated
  * testdata. The generator has regenerated files with changed physical
  * types before (round 7: `events.ts` went from int64 TIMESTAMP(NANOS) to
  * native `timestamp[us]`, silently breaking 14 queries and 13 specs) —
  * this spec turns the next such drift into ONE clearly-named failure.
  */
class SchemaContractSpec extends SparkSpec {

  private def typeOf(table: String, column: String): DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/$table.parquet").schema(column).dataType
  }

  test("events.ts is a type the normalizing reader handles") {
    val t = typeOf("events", "ts")
    assert(t == TimestampNTZType || t == TimestampType || t == LongType,
      s"events.ts regenerated as unhandled $t — update TpchGraph.normalizeTs " +
        "and its streaming twin EventStream.eventSource")
    // and the normalized contract every consumer relies on:
    assert(TpchGraph.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("events columns the pipelines consume") {
    val s = spark.read.parquet(s"$sf/events.parquet").schema
    assert(s("event_id").dataType == LongType)
    assert(s("user_id").dataType == LongType)
    assert(s("event_type").dataType == StringType)
    assert(s("value").dataType == DoubleType)
    assert(s("props").dataType == StringType)
  }

  test("documents columns the text pipelines consume") {
    val s = spark.read.parquet(s"$sf/documents.parquet").schema
    assert(s("doc_id").dataType == LongType)
    assert(s("text").dataType == StringType)
    assert(s("source").dataType == StringType)
  }

  test("embeddings.embedding is an array of float or double") {
    val s = spark.read.parquet(s"$sf/embeddings.parquet").schema
    assert(s("vec_id").dataType == LongType)
    s("embedding").dataType match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => fail(s"embeddings.embedding regenerated as $other — " +
        "ANN/dedup paths assume a numeric array column")
    }
  }
}
