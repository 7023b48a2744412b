package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/**
 * Binary struct transport for the streaming-SQL routes — the payload
 * serialization the generic changelog/temporal operators carry through
 * their typed tuples.
 *
 * The routes previously shipped payloads as per-record JSON text
 * (`to_json` on entry, `from_json` on exit). That is semantically
 * pinned (JsonTransportSpec) but pays text generation + parsing on
 * EVERY routed record — a real CPU tax at stream rates. The reference
 * pays no such tax: its operators serialize rows into keyed state with
 * its binary row serializer (BinaryRowData — PLANNER-J/runtime's
 * row serialization), not a text codec.
 *
 * [[StructPack]] is the Spark-native analogue: it evaluates the payload
 * struct to its UnsafeRow image and emits those bytes. [[StructUnpack]]
 * wraps the bytes back as an UnsafeRow of the view's schema — a
 * zero-copy pointTo, no field decoding at all (downstream field access
 * reads directly from the byte image, exactly how Spark reads any
 * UnsafeRow). Fidelity is trivially bit-exact for the WHOLE type
 * lattice — timestamps stay raw µs longs (the ms-truncation hazard the
 * JSON options had to pin away cannot exist here), doubles stay raw
 * bits (NaN payloads, -0.0), strings/arrays/structs stay their UTF-8 /
 * nested UnsafeRow images. StructTransportSpec is the property dual of
 * JsonTransportSpec over the same generator lattice.
 *
 * Determinism: for one schema, equal values produce equal bytes —
 * UnsafeRowWriter zeroes padding and null slots, so the image is a
 * canonical function of the row's values. That makes the bytes safe to
 * use both as map/state keys (payload-equality staleness guards in the
 * changelog operators) and as grouping keys (set operations key state
 * on the whole projected row).
 */
case class StructPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "struct_pack"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"struct_pack requires a struct argument, got ${other.catalogString}")
  }

  @transient private lazy val proj =
    UnsafeProjection.create(child.dataType.asInstanceOf[StructType])

  /** The struct's canonical UnsafeRow image, copied out of the
    * projection's reused buffer. */
  def pack(row: InternalRow): Array[Byte] = {
    val ur = proj(row)
    val out = new Array[Byte](ur.getSizeInBytes)
    ur.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    out
  }

  protected override def nullSafeEval(input: Any): Any =
    pack(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the UnsafeProjection itself is generated code (not serializable);
    // reference THIS expression and call pack() — the projection
    // rebuilds once per deserialized task, Spark's own pattern for
    // expressions with non-serializable transient machinery
    val ref = ctx.addReferenceObj("packer", this, classOf[StructPack].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pack($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StructPack =
    copy(child = newChild)
}

/** Driver-free [[StructPack]] for TYPED operators: packs external Rows
  * to their canonical UnsafeRow images inside a closure (the streaming
  * MATCH_RECOGNIZE one-row-per-match emission ships each match's rows
  * this way). The encoder/projection machinery is non-serializable, so
  * it rebuilds lazily once per executor after closure deserialization —
  * the same pattern as StructPack's addReferenceObj. */
class RowPacker(schema: StructType) extends Serializable {
  @transient private lazy val toInternal =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
      .createSerializer()
  @transient private lazy val proj = UnsafeProjection.create(schema)

  def pack(row: org.apache.spark.sql.Row): Array[Byte] = {
    val ur = proj(toInternal(row))
    val out = new Array[Byte](ur.getSizeInBytes)
    ur.writeToMemory(out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    out
  }
}

/** Inverse of [[StructPack]]: wrap the byte image back as an UnsafeRow
  * of `schema` — zero-copy, no per-field decode. */
case class StructUnpack(child: Expression, schema: StructType)
    extends UnaryExpression {

  override def dataType: DataType = schema
  override def prettyName: String = "struct_unpack"
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"struct_unpack requires a binary argument, got ${other.catalogString}")
  }

  /** Fixed-width prefix every UnsafeRow of this schema must carry:
    * null bitset (one 64-bit word per 64 fields) + an 8-byte slot per
    * field. Variable-width data follows, so this is a lower bound. */
  @transient private lazy val minBytes: Int =
    UnsafeRow.calculateBitSetWidthInBytes(schema.length) + 8 * schema.length

  def unpack(bytes: Array[Byte]): InternalRow = {
    if (bytes.length < minBytes)
      throw new IllegalArgumentException(
        s"struct_unpack: ${bytes.length}-byte image is too short for a " +
        s"${schema.length}-field row (needs >= $minBytes bytes) — the " +
        "bytes were packed with a different schema")
    val row = new UnsafeRow(schema.length)
    row.pointTo(bytes, bytes.length)
    row
  }

  protected override def nullSafeEval(input: Any): Any =
    unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unpacker", this, classOf[StructUnpack].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.unpack($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StructUnpack =
    copy(child = newChild)
}
