package graft.sources.pbd

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{ClusionInput, Clusions}
import graft.sources.Sources
import PbdDescriptors._

/** from_pbd analog (reference: pbd.cpp:152-168): the PBD container is
  * magic `0x000010bd` + version varint + varint-counted
  * length-prefixed FileDescriptorProtos + the root message full name
  * + varint-delimited message payloads.
  *
  * Spark-first shape: the (small) descriptor header parses on the
  * driver; record payload boundaries are found with one cheap varint
  * scan; the byte slices then parallelize so the actual protobuf
  * decode — the expensive part — runs on executors. Decoding follows
  * the reference's semantics: include/exclude prune to a field subset
  * and everything else is skipped at wire level without parsing
  * (pbd.hpp:176-207); proto3 defaults are synthesized for absent
  * scalar fields (pbd.cpp:215-357 — absent string → "", ints → 0,
  * enum → value 0's name); enums materialize as strings; uint32/64
  * widen per SURVEY §1.5; groups are rejected (pbd.hpp:194-198).
  *
  * Divergence (documented): the reference treats enum columns from
  * different sources as distinct types and REFUSES to merge them
  * unless their value tables are identical (columns.cpp:22-32);
  * graft's enum-as-string representation makes cross-source unions
  * legal by construction — two enums union as their value NAMES,
  * with no identity check. Callers needing the reference's strict
  * behavior must compare descriptor enum tables themselves.
  */
object PbdSource {
  private val MAGIC = 0x000010bd

  final case class PbdFile(registry: Registry, root: PMessage,
                           records: Array[Array[Byte]])

  /** Header only: descriptors + root name, and the offset where
    * record payloads begin — no record bytes are copied (read()
    * scans boundaries in place; copying every payload up front would
    * double driver memory for nothing). */
  def parseHeader(bytes: Array[Byte]): (Registry, PMessage, Int) = {
    val w = new ProtoWire(bytes)
    val magic = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    require(magic == MAGIC, f"not a PBD file (magic 0x$magic%08x)")
    w.pos = 4
    val version = w.readVarint()
    require(version == 0, s"unsupported PBD version $version")
    val nFiles = w.readVarint().toInt
    val files = (0 until nFiles).map(_ => w.readBytes())
    val registry = PbdDescriptors.parseFiles(files)
    val rootName = new String(w.readBytes(), "UTF-8")
    (registry, registry.message(rootName), w.pos)
  }

  def parseFile(bytes: Array[Byte]): PbdFile = {
    val (registry, root, start) = parseHeader(bytes)
    val w = new ProtoWire(bytes)
    w.pos = start
    val records = Iterator.unfold(())(_ =>
      if (w.hasMore) Some((w.readBytes(), ())) else None).toArray
    PbdFile(registry, root, records)
  }

  /** Spark schema of a message (full, before clusion pruning). */
  def schemaOf(m: PMessage, reg: Registry): StructType =
    StructType(m.fields.map { f =>
      val base = f.ptype match {
        case T.DOUBLE => DoubleType
        case T.FLOAT => FloatType
        case T.INT64 | T.SINT64 | T.SFIXED64 => LongType
        case T.INT32 | T.SINT32 | T.SFIXED32 => IntegerType
        case T.UINT32 => LongType // widen (no unsigned in Spark)
        case T.UINT64 | T.FIXED64 => LongType // documented overflow policy
        case T.FIXED32 => LongType
        case T.BOOL => BooleanType
        case T.STRING => StringType
        case T.BYTES => BinaryType
        case T.ENUM => StringType
        case T.MESSAGE => schemaOf(reg.message(f.typeName), reg)
        case T.GROUP =>
          throw new IllegalArgumentException("proto groups are not supported")
        case other =>
          throw new IllegalArgumentException(s"unknown proto type $other")
      }
      StructField(f.name, if (f.repeated) ArrayType(base) else base)
    })

  def read(spark: SparkSession, path: String,
           include: ClusionInput = ClusionInput.Empty,
           exclude: ClusionInput = ClusionInput.Empty): DataFrame = {
    val localPath = path.stripPrefix("file:")
    val bytes = Files.readAllBytes(Paths.get(localPath))
    val (registry, rootMsg, start) = parseHeader(bytes)
    val full = schemaOf(rootMsg, registry)
    val pruned = Sources.pruneSchema(full,
      Sources.validatedFilter(full, include, exclude))

    // Tasks receive only contiguous byte ranges (record-aligned, found
    // by the driver's cheap varint scan) and re-read the file
    // themselves through the Hadoop filesystem for `path` — so the
    // same code works when executors live on other hosts (HDFS/S3/
    // shared FS), not just against the driver's local disk. The
    // payload never ships through the scheduler.
    val w = new ProtoWire(bytes)
    w.pos = start
    val boundaries = scala.collection.mutable.ArrayBuffer[Int](w.pos)
    while (w.hasMore) { w.skip(2); boundaries += w.pos }
    val nChunks = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (boundaries.size - 1) / 1024 + 1))
    val per = math.max(1, (boundaries.size - 1 + nChunks - 1) / nChunks)
    val chunks = (0 until boundaries.size - 1 by per).map { i =>
      (boundaries(i), boundaries(math.min(i + per, boundaries.size - 1)))
    }

    val pathStr = path
    val rdd = spark.sparkContext.parallelize(chunks, math.max(1, chunks.size))
      .flatMap { case (chunkStart, chunkEnd) =>
        val hPath = new org.apache.hadoop.fs.Path(
          if (pathStr.contains(":")) pathStr else "file:" + pathStr)
        val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(hPath)
        val buf = new Array[Byte](chunkEnd - chunkStart)
        try { in.seek(chunkStart.toLong); in.readFully(buf) } finally in.close()
        val decoder = new PbdRowDecoder(rootMsg, pruned, registry)
        val cw = new ProtoWire(buf)
        Iterator.unfold(())(_ =>
          if (cw.hasMore) Some((decoder.decode(new ProtoWire(cw.readBytes())), ()))
          else None)
      }
    // internal rows go straight in — no external-Row re-encoding pass
    org.apache.spark.sql.graftglue.Bridge.internalCreateDataFrame(spark, rdd, pruned)
  }

}

/** Precompiled per-schema decoder: field number -> slot/action table
  * (the reference's descriptor precompilation, pbd.cpp:85-150).
  * Fields outside the pruned schema are skipped at wire level.
  */
final class PbdRowDecoder(msg: PMessage, schema: StructType, reg: Registry)
  extends Serializable {
  import T._

  private val byNumber: Map[Int, (PField, Int, DataType)] =
    msg.fields.flatMap { f =>
      schema.fields.indexWhere(_.name == f.name) match {
        case -1 => None
        case slot => Some((f.number, (f, slot, schema(slot).dataType)))
      }
    }.toMap

  private val subDecoders: Map[Int, PbdRowDecoder] = byNumber.collect {
    case (num, (f, _, dt)) if f.ptype == MESSAGE =>
      val elemSchema = dt match {
        case st: StructType => st
        case ArrayType(st: StructType, _) => st
      }
      num -> new PbdRowDecoder(reg.message(f.typeName), elemSchema, reg)
  }

  def decode(bytes: Array[Byte]): InternalRow = decode(new ProtoWire(bytes))

  def decode(w: ProtoWire): InternalRow = {
    val out = new Array[Any](schema.length)
    val lists = new Array[java.util.ArrayList[Any]](schema.length)
    while (w.hasMore) {
      val tag = w.readVarint()
      val num = (tag >> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(num) match {
        case None => w.skip(wt) // unselected/unknown: wire-level skip
        case Some((f, slot, _)) =>
          if (f.repeated) {
            if (lists(slot) == null) lists(slot) = new java.util.ArrayList[Any]()
            if (wt == 2 && isPackable(f.ptype)) {
              val s = w.readSlice() // packed scalars
              while (s.hasMore) lists(slot).add(scalar(f, s, -1))
            } else lists(slot).add(scalar(f, w, num))
          } else out(slot) = scalar(f, w, num)
      }
    }
    var i = 0
    while (i < schema.length) {
      if (lists(i) != null)
        out(i) = new GenericArrayData(lists(i).toArray)
      else if (out(i) == null) out(i) = defaults(i)
      i += 1
    }
    new GenericInternalRow(out)
  }

  /** proto3 defaults per slot, precomputed (pbd.cpp:215-357): absent
    * scalars synthesize zero values, absent repeated fields empty
    * lists, absent sub-messages null. All instances immutable. */
  private val defaults: Array[Any] = {
    val d = new Array[Any](schema.length)
    byNumber.values.foreach { case (f, slot, _) =>
      d(slot) =
        if (f.repeated) new GenericArrayData(Array.empty[Any])
        else f.ptype match {
          case DOUBLE => 0.0
          case FLOAT => 0.0f
          case INT64 | SINT64 | SFIXED64 | UINT64 | FIXED64 => 0L
          case INT32 | SINT32 | SFIXED32 => 0
          case UINT32 | FIXED32 => 0L
          case BOOL => false
          case STRING => UTF8String.fromString("")
          case BYTES => Array.empty[Byte]
          case ENUM => UTF8String.fromString(
            reg.enum_(f.typeName).byNumber.getOrElse(0, "0"))
          case _ => null // MESSAGE and unknowns stay null
        }
    }
    d
  }

  private def isPackable(t: Int): Boolean =
    t != STRING && t != BYTES && t != MESSAGE && t != GROUP

  private def scalar(f: PField, w: ProtoWire, num: Int): Any = f.ptype match {
    case DOUBLE => java.lang.Double.longBitsToDouble(w.readFixed64())
    case FLOAT => java.lang.Float.intBitsToFloat(w.readFixed32())
    case INT64 => w.readVarint()
    case UINT64 => w.readVarint() // wraps, documented
    case INT32 => w.readVarint().toInt
    case UINT32 => w.readVarint() & 0xffffffffL
    case FIXED64 => w.readFixed64()
    case FIXED32 => w.readFixed32() & 0xffffffffL
    case SFIXED64 => w.readFixed64()
    case SFIXED32 => w.readFixed32()
    case SINT32 => w.readZigzag().toInt
    case SINT64 => w.readZigzag()
    case BOOL => w.readVarint() != 0L
    case STRING => UTF8String.fromBytes(w.readBytes())
    case BYTES => w.readBytes()
    case ENUM =>
      val number = w.readVarint().toInt
      UTF8String.fromString(
        reg.enum_(f.typeName).byNumber.getOrElse(number, number.toString))
    case MESSAGE => subDecoders(num).decode(w.readSlice())
    case GROUP =>
      throw new IllegalArgumentException("proto groups are not supported")
  }

}
