package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON *shape signature* of one payload row — the sound cache
  * key for skipping `spark.read.json` schema inference on repeat batches
  * (the engine-ingest fixed cost, VERDICT r10 top item).
  *
  * Soundness argument: Spark's JSON inference is a commutative,
  * associative merge (`compatibleType`) over per-row leaf types, and the
  * inferred struct field order is canonical (alphabetical). So the MERGED
  * batch schema is a pure function of the SET of (path, leaf-class) pairs
  * present in the batch — which is exactly what this kernel emits per row
  * (sorted, deduped, escaped `path:class` entries joined with `;`).
  * Identical batch signature sets ⇒ identical inferred schemas, so a
  * cached schema may replace the inference scan with zero output change.
  *
  * Leaf classes mirror `JsonInferSchema.inferField` under the engine's
  * fixed read options (`dropFieldIfAllNull=true`, `prefersDecimal=false`,
  * `inferTimestamp` off):
  *   - `0` null, and the empty string (Spark infers NullType for both)
  *   - `b` boolean, `l` int/long, `d` float/double, `s` non-empty string
  *   - objects recurse as `parent.child`, arrays as `path[]`
  *   - `{}` contributes no entries (StructType(Nil) is the merge identity)
  *
  * Anything whose inference this model does NOT reproduce bit-for-bit
  * returns the BAIL sentinel `!` instead of guessing — malformed JSON,
  * top-level non-objects, numbers beyond long/double (whose inferred
  * DecimalType precision depends on digit count, not class), duplicate
  * keys in one object, depth > 64, signatures > 4 KB. A bailed row makes
  * the whole batch uncacheable; the legacy inference path runs unchanged.
  */
case class JsonShapeSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_json_shape requires a string input, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_json_shape"

  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(JsonShape.signature(s.toString))

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[JsonShapeSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): JsonShapeSig =
    copy(child = newChild)
}

object JsonShape {
  import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

  /** Whole-batch bail sentinel: present in a batch's signature set ⇒ the
    * batch must take the legacy inference path. */
  val Bail = "!"

  private val factory = new JsonFactory()

  private final class BailOut extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private val bailOut = new BailOut

  /** One row's canonical shape: sorted deduped `path:class` entries. */
  def signature(json: String): String = {
    if (json == null || json.isEmpty) return Bail
    val entries = new java.util.TreeSet[String]()
    var parser: JsonParser = null
    try {
      parser = factory.createParser(json)
      if (parser.nextToken() != JsonToken.START_OBJECT) return Bail
      walkObject(parser, "", entries, 1)
      if (parser.nextToken() != null) return Bail // trailing content
      val sb = new java.lang.StringBuilder
      val it = entries.iterator()
      while (it.hasNext) {
        if (sb.length > 0) sb.append(';')
        sb.append(it.next())
        if (sb.length > 4096) return Bail
      }
      sb.toString
    } catch {
      case _: BailOut => Bail
      case _: Exception => Bail // malformed JSON
    } finally if (parser != null) parser.close()
  }

  /** Escape `.` `:` `;` `[` `\` in field names so paths can't alias. */
  private def escape(name: String): String = {
    var i = 0
    var clean = true
    while (clean && i < name.length) {
      val c = name.charAt(i)
      if (c == '.' || c == ':' || c == ';' || c == '[' || c == '\\') clean = false
      i += 1
    }
    if (clean) name
    else {
      val sb = new java.lang.StringBuilder
      i = 0
      while (i < name.length) {
        val c = name.charAt(i)
        if (c == '.' || c == ':' || c == ';' || c == '[' || c == '\\') sb.append('\\')
        sb.append(c)
        i += 1
      }
      sb.toString
    }
  }

  private def walkObject(p: JsonParser, path: String,
                         out: java.util.TreeSet[String], depth: Int): Unit = {
    if (depth > 64) throw bailOut
    val seen = new java.util.HashSet[String]()
    var t = p.nextToken()
    while (t != JsonToken.END_OBJECT) {
      if (t != JsonToken.FIELD_NAME) throw bailOut
      val name = p.currentName()
      if (!seen.add(name)) throw bailOut // duplicate key: merge order-dependent
      val sub = if (path.isEmpty) escape(name) else path + "." + escape(name)
      walkValue(p, sub, out, depth)
      t = p.nextToken()
    }
  }

  private def walkValue(p: JsonParser, path: String,
                        out: java.util.TreeSet[String], depth: Int): Unit = {
    p.nextToken() match {
      case JsonToken.START_OBJECT => walkObject(p, path, out, depth + 1)
      case JsonToken.START_ARRAY => walkArray(p, path + "[]", out, depth + 1)
      case JsonToken.VALUE_NULL => out.add(path + ":0")
      case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => out.add(path + ":b")
      case JsonToken.VALUE_NUMBER_INT =>
        p.getNumberType match {
          case JsonParser.NumberType.INT | JsonParser.NumberType.LONG =>
            out.add(path + ":l")
          case _ => throw bailOut // BigInteger: inferred decimal precision is value-dependent
        }
      case JsonToken.VALUE_NUMBER_FLOAT =>
        p.getNumberType match {
          case JsonParser.NumberType.FLOAT | JsonParser.NumberType.DOUBLE =>
            out.add(path + ":d")
          case _ => throw bailOut
        }
      case JsonToken.VALUE_STRING =>
        out.add(path + (if (p.getTextLength < 1) ":0" else ":s"))
      case _ => throw bailOut // embedded objects / unexpected structure
    }
  }

  /** Array element walk — same classes at `path[]`; an empty array adds a
    * `path[]:0` entry (ArrayType(NullType): dropped when all-empty, merge
    * identity against typed elements — same as all-null). */
  private def walkArray(p: JsonParser, path: String,
                        out: java.util.TreeSet[String], depth: Int): Unit = {
    if (depth > 64) throw bailOut
    var any = false
    var t = p.nextToken()
    while (t != JsonToken.END_ARRAY) {
      any = true
      t match {
        case JsonToken.START_OBJECT => walkObject(p, path, out, depth + 1)
        case JsonToken.START_ARRAY => walkArray(p, path + "[]", out, depth + 1)
        case JsonToken.VALUE_NULL => out.add(path + ":0")
        case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => out.add(path + ":b")
        case JsonToken.VALUE_NUMBER_INT =>
          p.getNumberType match {
            case JsonParser.NumberType.INT | JsonParser.NumberType.LONG =>
              out.add(path + ":l")
            case _ => throw bailOut
          }
        case JsonToken.VALUE_NUMBER_FLOAT =>
          p.getNumberType match {
            case JsonParser.NumberType.FLOAT | JsonParser.NumberType.DOUBLE =>
              out.add(path + ":d")
            case _ => throw bailOut
          }
        case JsonToken.VALUE_STRING =>
          out.add(path + (if (p.getTextLength < 1) ":0" else ":s"))
        case _ => throw bailOut
      }
      t = p.nextToken()
    }
    if (!any) out.add(path + ":0")
  }

  /** Column API over the shape kernel. */
  def shapeSig(json: Column): Column =
    Bridge.column(JsonShapeSig(Bridge.expression(json)))
}
