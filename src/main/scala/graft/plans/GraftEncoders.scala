package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, AgnosticEncoders}

/** Encoder derivation the public `Encoders` factory lacks: an
  * `Option[V]` encoder built from the element encoder. This keeps the
  * summer outputs `(K, batch, (Option[V], V))` fully PRODUCT-encoded —
  * a nullable struct field instead of a kryo binary blob — so store
  * outputs stay columnar: parquet-writable, prunable, filterable, and
  * readable by non-JVM engines. Falls back to kryo only when the element
  * encoder itself is opaque.
  */
object GraftEncoders {

  def option[V](implicit vEnc: Encoder[V]): Encoder[Option[V]] = vEnc match {
    case a: AgnosticEncoder[_] =>
      AgnosticEncoders.OptionEncoder(box(a)).asInstanceOf[Encoder[Option[V]]]
    case _ => Encoders.kryo[Option[V]]
  }

  /** Option of a primitive must hold null: swap primitive leaf encoders for
    * their boxed forms (mirrors what ScalaReflection derives for Option).
    */
  private def box(e: AgnosticEncoder[_]): AgnosticEncoder[_] = e match {
    case AgnosticEncoders.PrimitiveBooleanEncoder => AgnosticEncoders.BoxedBooleanEncoder
    case AgnosticEncoders.PrimitiveByteEncoder    => AgnosticEncoders.BoxedByteEncoder
    case AgnosticEncoders.PrimitiveShortEncoder   => AgnosticEncoders.BoxedShortEncoder
    case AgnosticEncoders.PrimitiveIntEncoder     => AgnosticEncoders.BoxedIntEncoder
    case AgnosticEncoders.PrimitiveLongEncoder    => AgnosticEncoders.BoxedLongEncoder
    case AgnosticEncoders.PrimitiveFloatEncoder   => AgnosticEncoders.BoxedFloatEncoder
    case AgnosticEncoders.PrimitiveDoubleEncoder  => AgnosticEncoders.BoxedDoubleEncoder
    case other                                    => other
  }

  /** (Option[V], V) — the Summer's prior/delta pair, product-encoded. */
  def priorDelta[V](implicit vEnc: Encoder[V]): Encoder[(Option[V], V)] =
    Encoders.tuple(option[V], vEnc)
}
