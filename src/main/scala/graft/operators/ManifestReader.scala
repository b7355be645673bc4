package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Driver-side parquet ROW reader for manifest-sized control-plane
  * files (r21). A manifest is one tiny parquet file, but reading it
  * through `spark.read.parquet(...).collect()` costs a full Spark job
  * (~40-80 ms of scheduling per resolution) — and the table layer
  * resolves manifests on every read, commit, probe and CDC diff.
  * Delta replays its log driver-side for exactly this reason; this is
  * that posture at this layer: parquet-mr's Group reader materializes
  * the rows in-process, zero jobs.
  *
  * Scope guard: the reader serves FILE-COUNT-SIZED relations only
  * (manifests), the same driver-sized bound every `.collect()` call
  * site here already assumes — it is not a data-plane read path.
  * Types outside the proven set, multi-file schema drift, or any
  * parquet surprise return None and the caller falls back to the
  * Spark read — behavior, not speed, is the invariant (statsOf's
  * footer-path discipline). Equivalence is spec-pinned by
  * ManifestReaderSpec against `spark.read.parquet().collect()`.
  */
private[operators] object ManifestReader {

  /** All rows of the single-schema parquet dir at `dirPath` as
    * (spark schema, external Rows) — or None when the fast path
    * cannot PROVE it reproduces the Spark read.
    */
  def readRows(s: org.apache.spark.sql.SparkSession,
               dirPath: String): Option[(StructType, IndexedSeq[Row])] = try {
    val hconf = s.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(dirPath)
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) return None
    val files = fs.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    if (files.isEmpty) return None
    var sparkSchemaJson: String = null
    var schema: StructType = null
    val rows = IndexedSeq.newBuilder[Row]
    files.foreach { st =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, hconf))
      try {
        val fm = reader.getFooter.getFileMetaData
        val json = fm.getKeyValueMetaData
          .get("org.apache.spark.sql.parquet.row.metadata")
        if (json == null) return None
        if (sparkSchemaJson == null) {
          sparkSchemaJson = json
          // all-nullable, exactly like spark.read.parquet (the file
          // source relaxes every parquet field to nullable)
          schema = StructType(DataType.fromJson(json).asInstanceOf[StructType]
            .fields.map(_.copy(nullable = true)))
          if (!schema.fields.forall(f => supported(f.dataType))) return None
        } else if (json != sparkSchemaJson) return None // multi-file drift
        val mschema = fm.getSchema
        // field order must agree between the two schemas for the
        // positional conversion below; a writer that reorders falls back
        if (mschema.getFieldCount != schema.length ||
            !schema.fields.zipWithIndex.forall { case (f, i) =>
              mschema.getFieldName(i) == f.name }) return None
        var pages = reader.readNextRowGroup()
        while (pages != null) {
          val colIO = new org.apache.parquet.io.ColumnIOFactory()
            .getColumnIO(mschema)
          val rec = colIO.getRecordReader(pages,
            new org.apache.parquet.example.data.simple.convert
              .GroupRecordConverter(mschema))
          var i = 0L
          val n = pages.getRowCount
          while (i < n) {
            rows += groupToRow(rec.read(), schema)
            i += 1
          }
          pages = reader.readNextRowGroup()
        }
      } finally reader.close()
    }
    Some((schema, rows.result()))
  } catch {
    case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] driver-side manifest read of $dirPath " +
        s"failed (falling back to the Spark read): $e")
      None
  }

  private def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType => true
    case _ => false
  }

  /** Driver-side parquet WRITE of a manifest-sized row set — the
    * other half of the zero-job control plane (a commit's manifest
    * write was one more scheduled Spark job + FileFormatWriter commit
    * round). Emits the same artifact shape Spark's writer produces
    * for these rows: a `part-*.parquet` file carrying the Spark
    * schema in the footer's row-metadata key (all-nullable — the form
    * every reader here compares), snappy-compressed like Spark's parquet
    * default. Returns false (caller falls back to the Spark write)
    * for types outside the proven set or any parquet surprise; a torn
    * file cannot be committed because the commit-log link happens
    * strictly after this returns.
    */
  def writeRows(s: org.apache.spark.sql.SparkSession, dirPath: String,
                schema0: StructType, rows: Seq[Row]): Boolean = try {
    if (!schema0.fields.forall(f => supported(f.dataType))) return false
    val schema = StructType(schema0.fields.map(_.copy(nullable = true)))
    val hconf = new org.apache.hadoop.conf.Configuration(
      s.sparkContext.hadoopConfiguration)
    val mtypes = schema.fields.map { f =>
      import org.apache.parquet.schema._
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      val b = f.dataType match {
        case BooleanType => Types.optional(BOOLEAN)
        case ByteType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(8, true))
        case ShortType   => Types.optional(INT32)
          .as(LogicalTypeAnnotation.intType(16, true))
        case IntegerType => Types.optional(INT32)
        case LongType    => Types.optional(INT64)
        case FloatType   => Types.optional(FLOAT)
        case DoubleType  => Types.optional(DOUBLE)
        case DateType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType())
        case StringType  => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case other => sys.error(s"unreachable: $other")
      }
      b.named(f.name)
    }
    val mschema = new org.apache.parquet.schema.MessageType("spark_schema",
      mtypes.toArray: _*)
    val dir = new org.apache.hadoop.fs.Path(dirPath)
    val file = new org.apache.hadoop.fs.Path(dir,
      s"part-00000-${WriterToken.next()}.snappy.parquet")
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(file, hconf))
      .withType(mschema)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .withExtraMetaData(java.util.Map.of(
        "org.apache.spark.sql.parquet.row.metadata", schema.json))
      .withConf(hconf)
      .build()
    try {
      val factory = new org.apache.parquet.example.data.simple
        .SimpleGroupFactory(mschema)
      rows.foreach { r =>
        val g = factory.newGroup()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = r.get(i)
          if (v != null) f.dataType match {
            case BooleanType => g.add(i, v.asInstanceOf[Boolean])
            case ByteType    => g.add(i, v.asInstanceOf[Byte].toInt)
            case ShortType   => g.add(i, v.asInstanceOf[Short].toInt)
            case IntegerType => g.add(i, v.asInstanceOf[Int])
            case LongType    => g.add(i, v.asInstanceOf[Long])
            case FloatType   => g.add(i, v.asInstanceOf[Float])
            case DoubleType  => g.add(i, v.asInstanceOf[Double])
            case DateType    => g.add(i, org.apache.spark.sql.catalyst.util
              .DateTimeUtils.fromJavaDate(v.asInstanceOf[java.sql.Date]))
            case StringType  => g.add(i, v.asInstanceOf[String])
            case other => sys.error(s"unreachable: $other")
          }
        }
        writer.write(g)
      }
    } finally writer.close()
    true
  } catch {
    case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] driver-side manifest write to $dirPath " +
        s"failed (falling back to the Spark write): $e")
      // sweep a torn partial file so the Spark fallback writes clean
      scala.util.Try(graft.IndexLifecycle.deleteRecursively(dirPath))
      false
  }

  /** unionByName(allowMissingColumns = true) on local row sets — the
    * manifest-union shape every rewriting commit uses, computed
    * driver-side. Output schema = left's fields then right-only
    * fields (Spark's order), every field nullable (missing columns
    * surface null, the can't-prune value every stats consumer
    * honors). A shared name whose types differ returns None — the
    * caller falls back to Spark's union, which owns type reconciliation.
    */
  def unionRows(a: (StructType, Seq[Row]),
                b: (StructType, Seq[Row])): Option[(StructType, Seq[Row])] = {
    val (as, ar) = a
    val (bs, br) = b
    val bByName = bs.fields.map(f => f.name -> f).toMap
    val aNames = as.fieldNames.toSet
    for (f <- as.fields; g <- bByName.get(f.name))
      if (f.dataType != g.dataType) return None
    val outFields = as.fields.map(_.copy(nullable = true)) ++
      bs.fields.filterNot(f => aNames.contains(f.name))
        .map(_.copy(nullable = true))
    val out = StructType(outFields)
    def align(schema: StructType, rows: Seq[Row]): Seq[Row] = {
      val idx = schema.fieldNames.zipWithIndex.toMap
      rows.map { r =>
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          outFields.map(f => idx.get(f.name).map(r.get).orNull).toArray[Any], out)
      }
    }
    Some((out, align(as, ar) ++ align(bs, br)))
  }

  private def groupToRow(g: org.apache.parquet.example.data.Group,
                         schema: StructType): Row = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      if (g.getFieldRepetitionCount(i) == 0) null
      else f.dataType match {
        case StringType  => g.getString(i, 0)
        case LongType    => g.getLong(i, 0)
        case IntegerType => g.getInteger(i, 0)
        case DoubleType  => g.getDouble(i, 0)
        case FloatType   => g.getFloat(i, 0)
        case BooleanType => g.getBoolean(i, 0)
        case ShortType   => g.getInteger(i, 0).toShort
        case ByteType    => g.getInteger(i, 0).toByte
        case DateType    => org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaDate(g.getInteger(i, 0))
        case other => sys.error(s"unreachable: unsupported type $other")
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      cells.toArray[Any], schema)
  }
}
