package graft.api

import scala.concurrent.Future

/** A live external key-value service (feature store, cache, RPC backend) —
  * the rebuild of the reference's online `ReadableStore` lookup path
  * (summingbird-online/FlatMapOperation.scala:113-137: async `multiGet`
  * against a mutable store with bounded outstanding futures, the
  * `MaxWaitingFutures` option, online/option/AllOpts.scala:36-45).
  *
  * The factory is what ships in the closure (it must be Serializable and
  * cheap); each Spark partition opens ONE connection, pipelines batched
  * async `multiGet`s through it, and closes it when the task completes —
  * so at 1000 executors the service sees one connection and
  * |rows|/batchSize lookups per task, never a connection or RPC per row.
  */
trait ExternalService[K, W] extends Serializable {
  def open(): ExternalService.Conn[K, W]
}

object ExternalService {
  /** A live connection. `multiGet` is async so the caller can keep several
    * batches in flight (the MaxWaitingFutures analogue); keys absent from
    * the returned map are treated as misses.
    */
  trait Conn[K, W] {
    def multiGet(keys: Seq[K]): Future[Map[K, W]]
    def close(): Unit
  }

  /** Wrap a plain synchronous lookup function as a service (completes each
    * multiGet eagerly — no pipelining benefit, but the same lifecycle).
    */
  def fromFunction[K, W](f: K => Option[W]): ExternalService[K, W] =
    new ExternalService[K, W] {
      def open(): Conn[K, W] = new Conn[K, W] {
        def multiGet(keys: Seq[K]): Future[Map[K, W]] =
          Future.successful(keys.iterator.flatMap(k => f(k).map(k -> _)).toMap)
        def close(): Unit = ()
      }
    }
}
