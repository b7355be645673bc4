package graft.sources

import graft.SparkSpecBase
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[AvroSource]]: the no-connector Avro fallback — round trip,
  * interop with containers written by the Avro library itself, the
  * logical-type matrix, nested shapes, the pointer-flip publication,
  * and loud rejection outside the covered type set.
  */
class AvroSourceSpec extends SparkSpecBase {

  test("round trip: primitives, date/timestamp/decimal, array/map/struct, nulls") {
    val out = tmpDir("avro-rt")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("score", DoubleType, nullable = true),
      StructField("day", DateType, nullable = true),
      StructField("at", TimestampType, nullable = true),
      StructField("amt", DecimalType(10, 2), nullable = true),
      StructField("blob", BinaryType, nullable = true),
      StructField("tags", ArrayType(StringType), nullable = true),
      StructField("kv", MapType(StringType, LongType), nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = false),
        StructField("b", StringType, nullable = true))), nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", true, 1.5,
        java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789123"),
        new java.math.BigDecimal("12345.67"),
        Array[Byte](1, 2, 3), Seq("x", "y"), Map("k" -> 9L), Row(7, "in")),
      Row(2L, null, false, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroSource.write(df, out)
    val back = AvroSource.read(spark, out)
    assert(back.schema == schema, s"schema drifted: ${back.schema} vs $schema")
    val got = back.collect().map(r => (r.getLong(0), r)).toMap
    val r1 = got(1L)
    assert(r1.getString(1) == "alpha" && r1.getBoolean(2) && r1.getDouble(3) == 1.5)
    assert(r1.getDate(4) == java.sql.Date.valueOf("2024-03-01"))
    assert(r1.getTimestamp(5) ==
      java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789123"),
      s"micros lost: ${r1.getTimestamp(5)}")
    assert(r1.getDecimal(6).compareTo(new java.math.BigDecimal("12345.67")) == 0)
    assert(r1.getAs[Array[Byte]](7).toSeq == Seq[Byte](1, 2, 3))
    assert(r1.getSeq[String](8) == Seq("x", "y"))
    assert(r1.getMap[String, Long](9) == Map("k" -> 9L))
    assert(r1.getStruct(10) == Row(7, "in"))
    val r2 = got(2L)
    assert(!r2.getBoolean(2)) // non-nullable flag carries its value
    (Seq(1) ++ (3 to 10)).foreach(i =>
      assert(r2.isNullAt(i), s"field $i should be null"))
  }

  test("interop: containers written by the raw Avro library read back (enum, fixed, union)") {
    val dir = tmpDir("avro-interop")
    val avro = SchemaBuilder.record("Doc").fields()
      .requiredLong("id")
      .name("lang").`type`(SchemaBuilder.enumeration("Lang")
        .symbols("en", "de", "fr")).noDefault()
      .name("tag").`type`().unionOf().nullType().and().stringType().endUnion()
        .nullDefault()
      .name("fp").`type`(SchemaBuilder.fixed("Fp8").size(4)).noDefault()
      .endRecord()
    val f = new java.io.File(dir, "hand.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    w.create(avro, f)
    def rec(id: Long, lang: String, tag: String): GenericRecord = {
      val r = new GenericData.Record(avro)
      r.put("id", id)
      r.put("lang", new GenericData.EnumSymbol(avro.getField("lang").schema(), lang))
      r.put("tag", tag)
      r.put("fp", new GenericData.Fixed(avro.getField("fp").schema(),
        Array[Byte](id.toByte, 0, 0, 1)))
      r
    }
    w.append(rec(1, "en", "keep"))
    w.append(rec(2, "de", null))
    w.close()
    val df = AvroSource.read(spark, dir)
    assert(df.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("tag", StringType, nullable = true),
      StructField("fp", BinaryType, nullable = false))))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "en" &&
      rows(0).getString(2) == "keep" &&
      rows(0).getAs[Array[Byte]](3).toSeq == Seq[Byte](1, 0, 0, 1))
    assert(rows(1).getString(1) == "de" && rows(1).isNullAt(2))
  }

  test("write publishes via the pointer flip; rewrites supersede; crash debris is swept") {
    import graft.Tables
    val out = tmpDir("avro-flip")
    val df = Tables.region(spark, sfDir)
    AvroSource.write(df, out)
    val seg1 = AvroSource.dataDir(out)
    assert(seg1 != out && seg1.contains("_avroseg-"))
    assert(AvroSource.read(spark, out).count() == df.count())
    // a second write flips to a fresh segment and retires the old one
    AvroSource.write(df.limit(2), out)
    val seg2 = AvroSource.dataDir(out)
    assert(seg2 != seg1 && AvroSource.read(spark, out).count() == 2)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(seg1)),
      "superseded segment survived")
    // crash BEFORE a flip: an orphan segment — readers resolve the
    // committed head; the next write sweeps it
    val orphan = java.nio.file.Paths.get(out, "_avroseg-orphantok")
    java.nio.file.Files.createDirectories(orphan)
    assert(AvroSource.dataDir(out) == seg2)
    AvroSource.write(df.limit(1), out)
    assert(!java.nio.file.Files.exists(orphan), "orphan segment not swept")
    assert(AvroSource.read(spark, out).count() == 1)
  }

  test("multi-branch unions map like the connector: promotions, member structs (r20)") {
    val dir = tmpDir("avro-union")
    val avro = SchemaBuilder.record("U").fields()
      .requiredLong("id")
      // plain [int, long] and [null, float, double]: lossless promotions
      .name("n").`type`().unionOf().intType().and().longType().endUnion()
        .noDefault()
      .name("x").`type`().unionOf().nullType().and().floatType().and()
        .doubleType().endUnion().nullDefault()
      // [null, string, long]: the member-struct convention
      .name("u").`type`().unionOf().nullType().and().stringType().and()
        .longType().endUnion().nullDefault()
      .endRecord()
    val f = new java.io.File(dir, "u.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    w.create(avro, f)
    def rec(id: Long, n: Any, x: Any, u: Any): GenericRecord = {
      val r = new GenericData.Record(avro)
      r.put("id", id); r.put("n", n); r.put("x", x); r.put("u", u)
      r
    }
    w.append(rec(1L, Integer.valueOf(7), java.lang.Float.valueOf(1.5f), "tagged"))
    w.append(rec(2L, java.lang.Long.valueOf(1L << 40),
      java.lang.Double.valueOf(2.25), java.lang.Long.valueOf(42L)))
    w.append(rec(3L, Integer.valueOf(-3), null, null))
    w.close()
    val df = AvroSource.read(spark, dir)
    assert(df.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("x", DoubleType, nullable = true),
      StructField("u", StructType(Seq(
        StructField("member0", StringType, nullable = true),
        StructField("member1", LongType, nullable = true))), nullable = true))))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(1) == 7L && rows(0).getDouble(2) == 1.5)
    assert(rows(0).getStruct(3).getString(0) == "tagged" &&
      rows(0).getStruct(3).isNullAt(1))
    assert(rows(1).getLong(1) == (1L << 40) && rows(1).getDouble(2) == 2.25)
    assert(rows(1).getStruct(3).isNullAt(0) &&
      rows(1).getStruct(3).getLong(1) == 42L)
    assert(rows(2).getLong(1) == -3L && rows(2).isNullAt(2) && rows(2).isNullAt(3))
    // a logical-typed branch blocks the promotion (a [date-int, long]
    // collapsed to long would silently erase the date semantics)
    val dSchema = org.apache.avro.LogicalTypes.date()
      .addToSchema(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT))
    val guarded = org.apache.avro.Schema.createUnion(
      dSchema, org.apache.avro.Schema.create(org.apache.avro.Schema.Type.LONG))
    val (t, _) = AvroSource.sparkTypeOf(guarded)
    assert(t == StructType(Seq(
      StructField("member0", DateType, nullable = true),
      StructField("member1", LongType, nullable = true))), t)
    // no containers still fails loudly
    intercept[IllegalArgumentException] {
      AvroSource.read(spark, tmpDir("avro-empty"))
    }
  }

  test("timestamp-millis logical type decodes (micros is the write default)") {
    val dir = tmpDir("avro-tsmillis")
    val avro = SchemaBuilder.record("T").fields().requiredLong("id")
      .name("at").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .endRecord()
    val f = new java.io.File(dir, "t.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    w.create(avro, f)
    val r = new GenericData.Record(avro)
    r.put("id", 1L); r.put("at", 1709294096789L)
    w.append(r); w.close()
    val row = AvroSource.read(spark, dir).head()
    assert(row.getTimestamp(1).getTime == 1709294096789L)
  }
}
