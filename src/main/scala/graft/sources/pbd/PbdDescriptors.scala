package graft.sources.pbd

import scala.collection.mutable

/** Self-contained parser for the descriptor subset a PBD file
  * carries: FileDescriptorProto / DescriptorProto /
  * FieldDescriptorProto / EnumDescriptorProto, read straight off the
  * wire (descriptor.proto's layout is public protocol knowledge).
  */
object PbdDescriptors {

  // proto field type numbers (descriptor.proto FieldDescriptorProto.Type)
  object T {
    val DOUBLE = 1; val FLOAT = 2; val INT64 = 3; val UINT64 = 4
    val INT32 = 5; val FIXED64 = 6; val FIXED32 = 7; val BOOL = 8
    val STRING = 9; val GROUP = 10; val MESSAGE = 11; val BYTES = 12
    val UINT32 = 13; val ENUM = 14; val SFIXED32 = 15; val SFIXED64 = 16
    val SINT32 = 17; val SINT64 = 18
  }

  final case class PField(name: String, number: Int, repeated: Boolean,
                          ptype: Int, typeName: String)
  final case class PMessage(fullName: String, fields: Seq[PField])
  final case class PEnum(fullName: String, byNumber: Map[Int, String])

  final case class Registry(messages: Map[String, PMessage],
                            enums: Map[String, PEnum]) {
    def message(typeName: String): PMessage =
      messages.getOrElse(typeName.stripPrefix("."),
        throw new IllegalArgumentException(s"Unknown message type $typeName"))
    def enum_(typeName: String): PEnum =
      enums.getOrElse(typeName.stripPrefix("."),
        throw new IllegalArgumentException(s"Unknown enum type $typeName"))
  }

  def parseFiles(files: Seq[Array[Byte]]): Registry = {
    val messages = mutable.Map.empty[String, PMessage]
    val enums = mutable.Map.empty[String, PEnum]
    files.foreach(f => parseFile(new ProtoWire(f), messages, enums))
    Registry(messages.toMap, enums.toMap)
  }

  private def parseFile(w: ProtoWire, messages: mutable.Map[String, PMessage],
                        enums: mutable.Map[String, PEnum]): Unit = {
    var pkg = ""
    val pendingMessages = mutable.Buffer.empty[ProtoWire]
    val pendingEnums = mutable.Buffer.empty[ProtoWire]
    while (w.hasMore) {
      val tag = w.readVarint()
      val (field, wt) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 2 => pkg = new String(w.readBytes(), "UTF-8") // package
        case 4 => pendingMessages += w.readSlice() // message_type
        case 5 => pendingEnums += w.readSlice() // enum_type
        case _ => w.skip(wt)
      }
    }
    pendingMessages.foreach(parseMessage(_, pkg, messages, enums))
    pendingEnums.foreach(parseEnum(_, pkg, enums))
  }

  private def parseMessage(w: ProtoWire, scope: String,
                           messages: mutable.Map[String, PMessage],
                           enums: mutable.Map[String, PEnum]): Unit = {
    var name = ""
    val fields = mutable.Buffer.empty[PField]
    val nested = mutable.Buffer.empty[ProtoWire]
    val nestedEnums = mutable.Buffer.empty[ProtoWire]
    while (w.hasMore) {
      val tag = w.readVarint()
      val (field, wt) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => name = new String(w.readBytes(), "UTF-8")
        case 2 => fields += parseField(w.readSlice())
        case 3 => nested += w.readSlice() // nested_type
        case 4 => nestedEnums += w.readSlice() // enum_type
        case _ => w.skip(wt)
      }
    }
    val fullName = if (scope.isEmpty) name else s"$scope.$name"
    messages(fullName) = PMessage(fullName, fields.toSeq)
    nested.foreach(parseMessage(_, fullName, messages, enums))
    nestedEnums.foreach(parseEnum(_, fullName, enums))
  }

  private def parseField(w: ProtoWire): PField = {
    var name = ""; var number = 0; var label = 1; var ptype = 0
    var typeName = ""
    while (w.hasMore) {
      val tag = w.readVarint()
      val (field, wt) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => name = new String(w.readBytes(), "UTF-8")
        case 3 => number = w.readVarint().toInt
        case 4 => label = w.readVarint().toInt // 3 = LABEL_REPEATED
        case 5 => ptype = w.readVarint().toInt
        case 6 => typeName = new String(w.readBytes(), "UTF-8")
        case _ => w.skip(wt)
      }
    }
    PField(name, number, repeated = label == 3, ptype, typeName)
  }

  private def parseEnum(w: ProtoWire, scope: String,
                        enums: mutable.Map[String, PEnum]): Unit = {
    var name = ""
    val values = mutable.Map.empty[Int, String]
    while (w.hasMore) {
      val tag = w.readVarint()
      val (field, wt) = ((tag >> 3).toInt, (tag & 7).toInt)
      field match {
        case 1 => name = new String(w.readBytes(), "UTF-8")
        case 2 =>
          val vw = w.readSlice()
          var vname = ""; var vnum = 0
          while (vw.hasMore) {
            val vtag = vw.readVarint()
            ((vtag >> 3).toInt, (vtag & 7).toInt) match {
              case (1, _) => vname = new String(vw.readBytes(), "UTF-8")
              case (2, _) => vnum = vw.readVarint().toInt
              case (_, vwt) => vw.skip(vwt)
            }
          }
          values(vnum) = vname
        case _ => w.skip(wt)
      }
    }
    val fullName = if (scope.isEmpty) name else s"$scope.$name"
    enums(fullName) = PEnum(fullName, values.toMap)
  }
}
