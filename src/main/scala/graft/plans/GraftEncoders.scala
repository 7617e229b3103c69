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

  /** `Array[Long]` as a native array-of-bigint — for state-store values
    * holding id lists (never a kryo blob in the state store).
    */
  def longArray: Encoder[Array[Long]] =
    AgnosticEncoders.ArrayEncoder(AgnosticEncoders.PrimitiveLongEncoder,
      containsNull = false).asInstanceOf[Encoder[Array[Long]]]

  /** `Either[L, R]` as a PRODUCT encoder — physical layout
    * `(isRight: boolean, left: nullable struct, right: nullable struct)`
    * via Catalyst's TransformingEncoder, instead of a kryo binary blob.
    * Shuffles carrying Either rows stay columnar (prunable, readable,
    * tungsten-sized); only the thin tag/branch codec runs per row. Falls
    * back to kryo only when an element encoder itself is opaque.
    */
  def either[L, R](implicit lEnc: Encoder[L], rEnc: Encoder[R]): Encoder[Either[L, R]] =
    (lEnc, rEnc) match {
      case (_: AgnosticEncoder[_], _: AgnosticEncoder[_]) =>
        type Repr = (Boolean, Option[L], Option[R])
        val repr = Encoders.tuple(Encoders.scalaBoolean, option(lEnc), option(rEnc))
          .asInstanceOf[AgnosticEncoder[Repr]]
        AgnosticEncoders.TransformingEncoder[Either[L, R], Repr](
          scala.reflect.classTag[Either[L, R]],
          repr,
          () => new org.apache.spark.sql.catalyst.encoders.Codec[Either[L, R], Repr] {
            def encode(in: Either[L, R]): Repr = in match {
              case Left(a)  => (false, Some(a), None)
              case Right(b) => (true, None, Some(b))
            }
            def decode(out: Repr): Either[L, R] =
              if (out._1) Right(out._3.get) else Left(out._2.get)
          }).asInstanceOf[Encoder[Either[L, R]]]
      case _ => Encoders.kryo[Either[L, R]]
    }
}
