package graft.sources.pbd

/** Minimal protobuf wire-format emitter — the write-side twin of
  * [[ProtoWire]] (varints, fixed64, length-delimited blobs; all
  * public wire-format knowledge). Used to GENERATE PBD containers at
  * benchmark scale: the reference ships only a 592-byte golden file,
  * far too small to measure decode throughput against its
  * 200 k rec/s bound (pbd_tests.py:42-58 generates its perf input the
  * same way).
  */
final class ProtoOut {
  private val buf = new java.io.ByteArrayOutputStream()

  def writeVarint(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    buf.write(v.toInt)
  }
  def writeTag(field: Int, wireType: Int): Unit =
    writeVarint((field.toLong << 3) | wireType)
  def writeVarintField(field: Int, v: Long): Unit = {
    writeTag(field, 0); writeVarint(v)
  }
  def writeDoubleField(field: Int, d: Double): Unit = {
    writeTag(field, 1)
    val bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) { buf.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  def writeBytesField(field: Int, b: Array[Byte]): Unit = {
    writeTag(field, 2); writeVarint(b.length); buf.write(b, 0, b.length)
  }
  def writeStringField(field: Int, s: String): Unit =
    writeBytesField(field, s.getBytes("UTF-8"))
  def writeRaw(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
  def size: Int = buf.size()
  def toBytes: Array[Byte] = buf.toByteArray
}

/** PBD container writer for flat messages of scalar fields — enough
  * to materialize relational fixtures as PBD and measure the decoder
  * end to end. Container layout mirrors [[PbdSource.parseHeader]]:
  * magic, version varint, varint-counted length-prefixed
  * FileDescriptorProtos, root full name, varint-delimited records.
  */
object PbdWriter {

  /** (name, field number, PbdDescriptors.T type constant, and for
    * ENUM/MESSAGE fields the referenced type's full name). */
  final case class Field(name: String, number: Int, ptype: Int,
                         typeName: String = "")

  /** (enum simple name, (value name, value number) table). */
  final case class EnumDef(name: String, values: Seq[(String, Int)])

  /** Encode a FileDescriptorProto carrying one flat message
    * (descriptor.proto layout: file.name=1, file.package=2,
    * file.message_type=4, file.enum_type=5; message.name=1,
    * message.field=2; field.name=1, .number=3, .label=4, .type=5,
    * .type_name=6; enum.name=1, enum.value=2 with value.name=1,
    * value.number=2). */
  def fileDescriptor(pkg: String, msgName: String, fields: Seq[Field],
                     enums: Seq[EnumDef] = Nil): Array[Byte] = {
    val msg = new ProtoOut
    msg.writeStringField(1, msgName)
    fields.foreach { f =>
      val fd = new ProtoOut
      fd.writeStringField(1, f.name)
      fd.writeVarintField(3, f.number)
      fd.writeVarintField(4, 1) // LABEL_OPTIONAL
      fd.writeVarintField(5, f.ptype)
      if (f.typeName.nonEmpty) fd.writeStringField(6, f.typeName)
      msg.writeBytesField(2, fd.toBytes)
    }
    val file = new ProtoOut
    file.writeStringField(1, s"$pkg.proto")
    file.writeStringField(2, pkg)
    file.writeBytesField(4, msg.toBytes)
    enums.foreach { e =>
      val ed = new ProtoOut
      ed.writeStringField(1, e.name)
      e.values.foreach { case (vn, num) =>
        val vd = new ProtoOut
        vd.writeStringField(1, vn)
        vd.writeVarintField(2, num)
        ed.writeBytesField(2, vd.toBytes)
      }
      file.writeBytesField(5, ed.toBytes)
    }
    file.toBytes
  }

  /** Stream records into a PBD file; `encode` writes one record's
    * fields into the supplied ProtoOut. */
  def write(path: String, pkg: String, msgName: String, fields: Seq[Field],
            records: Iterator[ProtoOut => Unit],
            enums: Seq[EnumDef] = Nil): Unit = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20)
    try {
      out.write(Array[Byte](0x00, 0x00, 0x10, 0xbd.toByte))
      val head = new ProtoOut
      head.writeVarint(0) // version
      head.writeVarint(1) // one descriptor file
      val fd = fileDescriptor(pkg, msgName, fields, enums)
      head.writeVarint(fd.length)
      head.writeRaw(fd)
      val root = s"$pkg.$msgName".getBytes("UTF-8")
      head.writeVarint(root.length)
      head.writeRaw(root)
      out.write(head.toBytes)
      records.foreach { enc =>
        val r = new ProtoOut
        enc(r)
        val b = r.toBytes
        val len = new ProtoOut
        len.writeVarint(b.length)
        out.write(len.toBytes)
        out.write(b)
      }
    } finally out.close()
  }
}
