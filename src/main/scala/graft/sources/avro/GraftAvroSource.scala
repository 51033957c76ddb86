package graft.sources.avro

import java.io.File
import java.util
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for Avro object-container files — the
  * engine's `from_avro` (reference: avro_direct.cpp:168-213). Spark
  * ships no Avro connector in this environment, but the Avro core
  * library is on the classpath, so the schema-driven fast path is
  * re-implemented Spark-natively:
  *
  *  - the *writer* schema read from the file header gives the table
  *    schema (schema-driven mode — types exist even for all-null
  *    data, avro_direct.cpp:81-105);
  *  - column pruning pushes down as a rebuilt *reader* schema, so
  *    Avro's schema resolution skips deselected fields during decode
  *    (the reference's ColumnFilter projection,
  *    avro_direct.cpp:107-166);
  *  - decoding converts GenericRecord → InternalRow through a
  *    converter tree precompiled from the schema (the CNode idea,
  *    avro_decoder.hpp:29-56).
  *
  * One input partition per file (container files are also splittable
  * at sync-marker boundaries — the natural next step for huge files).
  * Local filesystem paths; `file:` URIs accepted.
  *
  * Usage: `spark.read.format("graft-avro").load(path)`.
  */
class GraftAvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = GraftAvroSource.listFiles(GraftAvroSource.paths(options))
    require(files.nonEmpty, "graft-avro: no .avro files found")
    AvroSchemas.toSpark(GraftAvroSource.writerSchema(files.head))
      .asInstanceOf[StructType]
  }

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftAvroTable(schema,
      GraftAvroSource.listFiles(
        GraftAvroSource.paths(new CaseInsensitiveStringMap(properties))))
}

object GraftAvroSource {
  /** Multi-path `load(a, b)` arrives as a JSON array string in the
    * "paths" option (Spark's FileDataSourceV2 convention) — splitting
    * on ',' would shred it (and any path containing a comma). */
  def paths(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("paths"))
      .map { raw =>
        val t = raw.trim
        if (t.startsWith("["))
          // minimal JSON string-array decode: "a","b" elements with \-escapes
          """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(t)
            .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
        else t.split(",").toSeq
      }
      .orElse(Option(options.get("path")).map(Seq(_)))
      .getOrElse(Seq.empty)

  def listFiles(paths: Seq[String]): Seq[String] = paths.flatMap { p =>
    val f = new File(p.stripPrefix("file:"))
    if (f.isDirectory)
      f.listFiles().toSeq.map(_.getPath).filter(_.endsWith(".avro")).sorted
    else Seq(f.getPath)
  }

  def writerSchema(path: String): Schema = {
    val r = new DataFileReader[GenericRecord](new File(path),
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }
}

class GraftAvroTable(tableSchema: StructType, files: Seq[String])
  extends Table with SupportsRead {
  override def name(): String = s"graft-avro(${files.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftAvroScanBuilder(tableSchema, files)
}

class GraftAvroScanBuilder(fullSchema: StructType, files: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftAvroScan(required, files)
}

class GraftAvroScan(required: StructType, files: Seq[String])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => GraftAvroPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAvroReaderFactory(required)
}

case class GraftAvroPartition(path: String) extends InputPartition

class GraftAvroReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[GraftAvroPartition].path
    new GraftAvroPartitionReader(path, required)
  }
}

class GraftAvroPartitionReader(path: String, required: StructType)
  extends PartitionReader[InternalRow] {

  private val reader = {
    val writer = GraftAvroSource.writerSchema(path)
    val readerSchema =
      if (required.isEmpty) writer // count(*)-style scan
      else AvroSchemas.prunedReaderSchema(writer, required)
    new DataFileReader[GenericRecord](new File(path),
      new GenericDatumReader[GenericRecord](writer, readerSchema))
  }
  private val convert = AvroDeserializer.forStruct(required)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (reader.hasNext) {
      current = convert(reader.next())
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
