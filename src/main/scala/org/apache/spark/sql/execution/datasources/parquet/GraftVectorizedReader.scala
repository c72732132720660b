package org.apache.spark.sql.execution.datasources.parquet

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.BlockMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * Version-boundary bridge (same pattern as `org.apache.spark.sql.graft.Shims`):
 * the cell store's columnar read path built on Spark's OWN vectorized parquet
 * decoder. `SpecificParquetRecordReaderBase.ParquetRowGroupReader` is
 * package-private, so the adapter that lets the store keep its statistics-based
 * row-group skipping has to live in this package.
 *
 * The store supplies the file, the pruned column set, and a per-row-group
 * keep predicate (its key-range skip); Spark's `VectorizedParquetRecordReader`
 * does the page decoding straight into `ColumnarBatch`es — ~10× less per-row
 * overhead than the parquet example `Group` API the row path used, and the
 * batches feed whole-stage codegen without a row pivot.
 */
object GraftVectorizedReader {

  /** Open `file` for vectorized reads of `required`, skipping row groups
    * that fail `keep` (invoked with the group's index and metadata, so
    * chunked reads can bound themselves to a group range). Caller drives
    * `nextBatch()`/`resultBatch()` and must `close()`. */
  def open(
      file: String,
      required: StructType,
      keep: (Int, BlockMetaData) => Boolean,
      capacity: Int): VectorizedParquetRecordReader = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try {
      val fileSchema = reader.getFooter.getFileMetaData.getSchema
      val requested = new MessageType(fileSchema.getName,
        required.fieldNames.map(n => fileSchema.getType(Seq(n): _*)): _*)
      reader.setRequestedSchema(requested)
      val keepMask = reader.getRowGroups.asScala.zipWithIndex
        .map { case (b, i) => keep(i, b) }.toArray
      val totalRows = reader.getRowGroups.asScala.zip(keepMask)
        .collect { case (b, true) => b.getRowCount }.sum
      val vec = new VectorizedParquetRecordReader(false, capacity)
      vec.initialize(fileSchema, requested,
        new SkippingRowGroupReader(reader, keepMask), totalRows.toInt)
      vec.initBatch(new StructType(), InternalRow.empty)
      vec
    } catch { case t: Throwable => reader.close(); throw t }
  }

  /** Feeds the vectorized decoder only the row groups the store kept;
    * skipped groups advance the file reader without page IO. */
  private class SkippingRowGroupReader(reader: ParquetFileReader, keep: Array[Boolean])
      extends SpecificParquetRecordReaderBase.ParquetRowGroupReader {
    private var i = 0
    override def readNextRowGroup(): PageReadStore = {
      while (i < keep.length && !keep(i)) { reader.skipNextRowGroup(); i += 1 }
      if (i >= keep.length) null
      else { i += 1; reader.readNextRowGroup() }
    }
    override def close(): Unit = reader.close()
  }
}

/**
 * Write-side twin of [[GraftVectorizedReader]]: a parquet writer that takes
 * Spark `InternalRow`s straight through Spark's own `ParquetWriteSupport` —
 * no per-field example-`Group` materialization, the same converter the
 * built-in parquet sink uses. The store's writers stream their sorted
 * slices through this.
 */
object GraftRowParquetWriter {

  def open(
      file: String,
      schema: StructType): org.apache.parquet.hadoop.ParquetWriter[InternalRow] = {
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    // the keys ParquetWriteSupport.init + SparkToParquetSchemaConverter
    // require (Spark's own write path copies them from the session conf;
    // here the values are pinned — the cell schema has no datetime or
    // field-id columns, so these choices are inert)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    new RowWriterBuilder(new org.apache.hadoop.fs.Path(file))
      .withConf(conf)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .build()
  }

  private class RowWriterBuilder(path: org.apache.hadoop.fs.Path)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new ParquetWriteSupport()
  }
}
