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
