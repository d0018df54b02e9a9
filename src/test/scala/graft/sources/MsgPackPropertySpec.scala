package graft.sources

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the MessagePack decoder: encode random JSON-ish value
  * trees with an independent reference encoder (public spec, written here in
  * the test), decode with Codecs, compare against the expected JSON. */
class MsgPackPropertySpec extends AnyFunSuite with graft.GenDriven {

  sealed trait V
  case object VNull extends V
  case class VBool(b: Boolean) extends V
  case class VLong(l: Long) extends V
  case class VStr(s: String) extends V
  case class VArr(vs: List[V]) extends V
  case class VMap(vs: List[(String, V)]) extends V

  private val genScalar: Gen[V] = Gen.oneOf(
    Gen.const(VNull),
    Arbitrary.arbitrary[Boolean].map(VBool),
    Arbitrary.arbitrary[Long].map(VLong),
    Gen.alphaNumStr.map(s => VStr(s.take(40))),
    // non-ASCII + escapes
    Gen.oneOf("héllo wörld", "tab\there", "quote\"q", "back\\slash", "新しい日").map(VStr))

  private def genV(depth: Int): Gen[V] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      5 -> genScalar,
      2 -> Gen.listOfN(3, genV(depth - 1)).map(VArr(_)),
      2 -> Gen.listOfN(3, Gen.zip(Gen.identifier.map(_.take(8)), genV(depth - 1)))
        .map(kvs => VMap(kvs.distinctBy(_._1))))

  /** Reference encoder (straight from the msgpack spec). */
  private def encode(v: V, out: java.io.ByteArrayOutputStream): Unit = v match {
    case VNull => out.write(0xc0)
    case VBool(true) => out.write(0xc3)
    case VBool(false) => out.write(0xc2)
    case VLong(l) =>
      if (l >= 0 && l <= 0x7f) out.write(l.toInt)
      else if (l < 0 && l >= -32) out.write((l & 0xff).toInt)
      else { out.write(0xd3); (7 to 0 by -1).foreach(i => out.write(((l >> (8 * i)) & 0xff).toInt)) }
    case VStr(s) =>
      val b = s.getBytes("UTF-8")
      if (b.length <= 31) out.write(0xa0 | b.length)
      else { out.write(0xda); out.write(b.length >> 8); out.write(b.length & 0xff) }
      out.write(b)
    case VArr(vs) =>
      if (vs.length <= 15) out.write(0x90 | vs.length)
      else { out.write(0xdc); out.write(vs.length >> 8); out.write(vs.length & 0xff) }
      vs.foreach(encode(_, out))
    case VMap(kvs) =>
      if (kvs.length <= 15) out.write(0x80 | kvs.length)
      else { out.write(0xde); out.write(kvs.length >> 8); out.write(kvs.length & 0xff) }
      kvs.foreach { case (k, value) => encode(VStr(k), out); encode(value, out) }
  }

  private def toJson(v: V): String = v match {
    case VNull => "null"
    case VBool(b) => b.toString
    case VLong(l) => l.toString
    case VStr(s) =>
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append("\"").toString
    case VArr(vs) => vs.map(toJson).mkString("[", ",", "]")
    case VMap(kvs) => kvs.map { case (k, x) => toJson(VStr(k)) + ":" + toJson(x) }
      .mkString("{", ",", "}")
  }

  test("decoder round-trips arbitrary msgpack value trees") {
    forAllSampled(genV(3), 200) { v =>
      val out = new java.io.ByteArrayOutputStream()
      encode(v, out)
      assert(Codecs.msgpackToJson(out.toByteArray) === Some(toJson(v)))
    }
  }

  test("trailing bytes or truncation fail cleanly (ExtraData semantics)") {
    val out = new java.io.ByteArrayOutputStream()
    encode(VMap(List("a" -> VLong(1))), out)
    val bytes = out.toByteArray
    assert(Codecs.msgpackToJson(bytes :+ 0x01.toByte) === None)  // extra data
    assert(Codecs.msgpackToJson(bytes.dropRight(1)) === None)    // truncated
    assert(Codecs.msgpackToJson(Array.empty[Byte]) === None)
  }

  test("float32/float64 and unsigned formats decode") {
    // 0xca float32 1.5, 0xcb float64 -2.25, 0xcc uint8 200, 0xcf uint64 max
    assert(Codecs.msgpackToJson(Array(0xca, 0x3f, 0xc0, 0, 0).map(_.toByte)) === Some("1.5"))
    assert(Codecs.msgpackToJson(
      Array(0xcb, 0xc0, 0x02, 0, 0, 0, 0, 0, 0).map(_.toByte)) === Some("-2.25"))
    assert(Codecs.msgpackToJson(Array(0xcc, 200).map(_.toByte)) === Some("200"))
    assert(Codecs.msgpackToJson(
      (0xcf +: Seq.fill(8)(0xff)).map(_.toByte).toArray) === Some("18446744073709551615"))
  }
}
