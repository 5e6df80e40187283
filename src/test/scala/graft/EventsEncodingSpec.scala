package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp-encoding drift guard (round-8 regression).
  *
  * The driver has generated `events.parquet` with three different
  * physical `ts` encodings across rounds:
  *   1. TIMESTAMP(NANOS)            — Spark reads as LongType under the
  *      legacy `nanosAsLong` flag that [[Tables.eventsRaw]] sets;
  *   2. TIMESTAMP_MICROS, NTZ       — Spark 4 infers TIMESTAMP_NTZ
  *      (this is the round-8 regeneration that broke 8 queries);
  *   3. TIMESTAMP_MICROS, UTC       — plain TimestampType.
  * [[Tables.events]] must yield an identical UTC TimestampType `ts`
  * (same `unix_millis`) for all of them, so a future regeneration can
  * never silently break the `unix_millis(ts)`-based queries again.
  */
class EventsEncodingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // epoch micros for three sample instants (whole-millisecond values so
  // the nanos floor-division is exact)
  private val microsVals = Seq(1704067200000000L, 1704067200123000L, 1735689600999000L)
  private val expectedMillis = microsVals.map(_ / 1000L)

  private def freshDir(): String = {
    val d = Files.createTempDirectory("events-enc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def readMillis(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"events() must normalize ts to UTC TimestampType, got ${df.schema("ts").dataType}")
    df.select(expr("unix_millis(ts)").as("ms")).orderBy("ms").as[Long].collect().toSeq
  }

  private def baseRows(tsCol: org.apache.spark.sql.Column) =
    microsVals.zipWithIndex.toDF("us", "event_id")
      .select($"event_id".cast(LongType), tsCol.as("ts"),
        lit(1L).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))

  test("nanos-as-long encoding normalizes to UTC timestamp") {
    val dir = freshDir()
    // Nanos written as a plain int64 exercise eventsNormalize's
    // LongType branch; the genuinely ANNOTATED fixture below covers
    // the legacy read mapping itself.
    baseRows((col("us") * 1000L).cast(LongType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.invalidate(dir)
    assert(readMillis(dir) === expectedMillis)
  }

  test("annotated TIMESTAMP(NANOS) parquet (parquet-mr writer) normalizes to UTC timestamp") {
    // Spark's writer cannot emit TIMESTAMP(NANOS), so build the fixture
    // with parquet-mr directly (the library the driver-side generator
    // used) — a REAL timestamp(isAdjustedToUTC=true, NANOS) annotation,
    // exercising the full legacy `nanosAsLong` read mapping
    // (annotation → LongType) plus the normalize branch, not just the
    // plain-int64 stand-in above. Closes ADVICE r9's gap.
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.io.api.Binary
    val dir = freshDir()
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true,
        LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    new java.io.File(s"$dir/events.parquet").mkdirs()
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-00000.parquet"))
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    microsVals.zipWithIndex.foreach { case (us, i) =>
      val g = gf.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L) // nanos since epoch, UTC-adjusted
      g.add("user_id", 1L)
      g.add("event_type", Binary.fromString("view"))
      g.add("value", 1.0)
      g.add("props", Binary.fromString("{}"))
      writer.write(g)
    }
    writer.close()
    Tables.invalidate(dir)
    // the raw legacy read must surface the annotated column as AN INT64
    // (nanosAsLong), not a timestamp — that mapping is what the
    // stand-in fixture above cannot reach
    val rawType = Tables.eventsRaw(spark, dir).schema("ts").dataType
    assert(rawType === LongType,
      s"annotated TIMESTAMP(NANOS) must read as LongType under nanosAsLong, got $rawType")
    assert(readMillis(dir) === expectedMillis)
  }

  test("micros-NTZ encoding (round-8 drift) normalizes to UTC timestamp") {
    val dir = freshDir()
    baseRows(timestamp_micros(col("us")).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.invalidate(dir)
    // sanity: the fixture really round-trips as NTZ
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType === TimestampNTZType)
    assert(readMillis(dir) === expectedMillis)
  }

  test("micros-UTC encoding passes through unchanged") {
    val dir = freshDir()
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      baseRows(timestamp_micros(col("us")))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
        spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    }
    Tables.invalidate(dir)
    assert(readMillis(dir) === expectedMillis)
  }
}
