package graft.hooks

import graft.metrics.SparkCommandMetrics
import org.apache.spark.sql.DataFrame

import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Read/write interception points.
  *
  * The reference exposes a dynamic `@slot/@hook` decorator system with
  * priorities and context-manager hooks on ~every public method
  * (onetl/hooks/hook.py:22-100, slot.py:27-234). Per SURVEY §2.8 we do NOT
  * port that machinery: an explicit listener trait covers the documented
  * use cases (lineage emission, auditing, frame rewriting) with static
  * types and no metaclass magic.
  */
trait GraftListener {
  def beforeRead(source: String): Unit = ()
  /** May replace the frame (the reference's replace-result hooks). */
  def afterRead(source: String, df: DataFrame): DataFrame = df
  def beforeWrite(target: String, df: DataFrame): Unit = ()
  def afterWrite(target: String, metrics: SparkCommandMetrics): Unit = ()
}

/** Global registry, mirroring the reference's process-wide hook state but
  * thread-safe. Scoped registration via `withListener`. */
object GraftListeners {
  private val listeners = new CopyOnWriteArrayList[GraftListener]()

  def register(l: GraftListener): Unit = listeners.add(l)
  def unregister(l: GraftListener): Unit = listeners.remove(l)
  def clear(): Unit = listeners.clear()
  def active: Seq[GraftListener] = listeners.asScala.toSeq

  def withListener[A](l: GraftListener)(body: => A): A = {
    register(l)
    try body finally unregister(l)
  }

  private[graft] def fireBeforeRead(source: String): Unit =
    active.foreach(_.beforeRead(source))
  private[graft] def fireAfterRead(source: String, df: DataFrame): DataFrame =
    active.foldLeft(df)((d, l) => l.afterRead(source, d))
  private[graft] def fireBeforeWrite(target: String, df: DataFrame): Unit =
    active.foreach(_.beforeWrite(target, df))
  private[graft] def fireAfterWrite(target: String,
                                    m: SparkCommandMetrics): Unit =
    active.foreach(_.afterWrite(target, m))
}
