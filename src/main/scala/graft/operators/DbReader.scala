package graft.operators

import graft.core._
import graft.connections.DbConnection
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** HWM column request: expression + optional qualified name
  * (the reference's AutoDetectHWM, onetl/hwm/auto_hwm.py:15 — the concrete
  * HWM type is detected from the source schema). */
final case class HwmColumn(expression: String, name: Option[String] = None) {
  def qualifiedName(source: String): String =
    name.getOrElse(s"$source.$expression")
}

/** Plan + execute the read of one table/collection/topic into a DataFrame,
  * windowed by the active [[graft.core.Strategy]].
  *
  * Port of the reference's DBReader semantics (onetl/db/db_reader/
  * db_reader.py:52,550-794), with the window-planning subtleties kept:
  *
  *  - start/stop both known → no MIN/MAX probe (db_reader.py:728-731);
  *  - MIN/MAX fetched with both edges INCLUSIVE; `>` vs `>=` applied only in
  *    the final dataframe query (db_reader.py:741-746);
  *  - empty source → `limit=0` so an *empty* frame (not an unfiltered one)
  *    returns (db_reader.py:752-756);
  *  - IncrementalStrategy pins `stop_at` to the observed max so the HWM
  *    matches dataframe content even if rows arrive mid-read (:786-792);
  *  - HWM is updated with the window stop *before* the lazy read executes
  *    (:592-595) — intentional eager-update semantics;
  *  - HWM without a HwmStrategy (and vice versa) is a usage error
  *    (:611-624).
  */
final case class DbReader(connection: DbConnection,
                          source: String,
                          columns: Seq[String] = Nil,
                          where: Seq[String] = Nil,
                          hint: Option[String] = None,
                          dfSchema: Option[StructType] = None,
                          hwm: Option[HwmColumn] = None) {

  /** The detected HWM template, probed ONCE per reader instance: it is a
    * pure function of (source, expression, source schema), and a batch
    * strategy calls `run()` once per WINDOW — re-probing the schema each
    * time cost one metadata round trip per window (a LIMIT-0 query on
    * JDBC sources, a footer-read job on file sources; measured 27 extra
    * Spark jobs on the 90-day batch-union gate). A mid-loop schema change
    * would have broken the already-initialized window math anyway, so
    * caching is semantics-preserving. */
  @transient private lazy val hwmTemplate: graft.core.Hwm = {
    val col = hwm.get
    connection.dialect.detectHwmClass(
      col.qualifiedName(source), source, col.expression,
      connection.getDfSchema(source, Seq(col.expression)).fields.head)
  }

  def run(): DataFrame =
    graft.util.SparkUtils.withJobDescription(connection.spark,
      s"${connection.getClass.getSimpleName} -> DbReader.run($source)") {
      graft.hooks.GraftListeners.fireBeforeRead(source)
      val strategy = checkStrategy()
      val (window, limit) = calculateWindowAndLimit(strategy)
      for {
        s <- strategy
        w <- window
        stop <- w.stopAt.value
      } s.updateHwm(stop)
      graft.hooks.GraftListeners.fireAfterRead(source, read(window, limit))
    }

  /** Single-pass incremental read: capture the HWM with a Spark
    * [[org.apache.spark.sql.Observation]] on the SAME job that materializes
    * the frame, instead of the reference's separate MIN/MAX pre-query
    * (db_reader.py:739-746 + jdbc_connection/connection.py:278-318 — two
    * scans of the source per run).
    *
    * Semantics difference, deliberately: the saved HWM is the max over the
    * rows the action actually processed (exactly-processed watermark), not
    * a max probed before the read — so rows arriving mid-read are picked up
    * by the NEXT run rather than silently skipped, and the source is
    * scanned once. The reference approximates this by pinning stop to the
    * probed max; with an observation no pinning is needed.
    *
    * `action` must FULLY materialize the frame it is given (count, write,
    * full collect). A partial action — `limit`/`take`/`head` — is unsafe
    * here: the observation sees only the rows that flowed through it, so
    * the HWM would advance to the max of an arbitrary subset and every
    * unprocessed row below it would fall out of all future windows. If the
    * action materializes nothing, the HWM is left unchanged. Requires an
    * [[IncrementalStrategy]] scope. */
  def runObservingHwm[A](action: DataFrame => A): A =
    graft.util.SparkUtils.withJobDescription(connection.spark,
      s"${connection.getClass.getSimpleName} -> DbReader.runObservingHwm($source)") {
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{expr => sexpr, max}
    val strategy = checkStrategy()
    val inc = strategy match {
      case Some(s: IncrementalStrategy) => s
      case _ => throw new IllegalArgumentException(
        "runObservingHwm requires an IncrementalStrategy scope")
    }
    graft.hooks.GraftListeners.fireBeforeRead(source)
    val col = hwm.get
    val bound = inc.fetchHwm(hwmTemplate)
    val window = Window(col.expression, startFrom = inc.startEdge)
    val obs = Observation(s"graft_hwm_${source}_${col.expression}")
    val df = graft.hooks.GraftListeners
      .fireAfterRead(source, read(Some(window), None))
      .observe(obs, max(sexpr(col.expression)).as("max"))
    val result = action(df)
    // the observation is delivered by an async QueryExecutionListener —
    // wait on its future with a bound rather than obs.get, which would
    // hang forever if the action never materialized the frame
    val observedMax =
      try Right(Option(scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(30, "s")).getAs[Any]("max")))
      catch {
        case _: java.util.concurrent.TimeoutException => Left("timeout")
      }
    observedMax match {
      case Right(Some(mx)) => inc.updateHwm(bound.withValue(mx).valueOpt.get)
      case Right(None) => // window was empty: keep the HWM
      case Left(_) =>
        // a late/dropped listener event is NOT the same as "no rows ran" —
        // be loud, because a stale HWM means the next run re-reads rows
        System.err.println(
          s"[graft] WARNING: observation for $source.${col.expression} not " +
            "delivered within 30s (listener bus busy, or the action never " +
            "materialized the frame) — HWM left unchanged; the next " +
            "incremental run will re-read this window")
    }
    result
  }

  /** `LIMIT 1` existence probe under the current window
    * (reference db_reader.py:452-512: limit=1 then take(1)). */
  def hasData: Boolean = {
    val strategy = checkStrategy()
    val window = strategy.map { s =>
      s.fetchHwm(hwmTemplate)
      Window(hwm.get.expression, startFrom = s.startEdge)
    }
    read(window, Some(1)).take(1).nonEmpty
  }

  def raiseIfNoData(): Unit =
    if (!hasData) throw new IllegalStateException(
      s"no data in source $source under the current window")

  private def read(window: Option[Window], limit: Option[Int]): DataFrame =
    connection.readSourceAsDf(
      source = source,
      columns = columns,
      where = connection.dialect.applyWindow(where, window),
      hint = hint,
      limit = limit,
      dfSchema = dfSchema)

  private def checkStrategy(): Option[HwmStrategy] = Strategy.current match {
    case s: HwmStrategy =>
      require(hwm.nonEmpty,
        s"${s.getClass.getSimpleName} cannot be used without DbReader(hwm=...)")
      Some(s)
    case _ =>
      require(hwm.isEmpty,
        "DbReader(hwm=...) requires an Incremental/Batch strategy scope — " +
          "wrap the run in Strategy.using(IncrementalStrategy()) { ... }")
      None
  }

  /** Port of db_reader.py:718-794. Returns (window, forced-limit). */
  private def calculateWindowAndLimit(
      strategyOpt: Option[HwmStrategy]): (Option[Window], Option[Int]) = {
    val strategy = strategyOpt.getOrElse(return (None, None))
    val col = hwm.get
    val bound = strategy.fetchHwm(hwmTemplate)
    val expr = col.expression

    def align(v: Any): Any = bound.withValue(v).valueOpt.get

    strategy match {
      case b: BatchHwmStrategy =>
        if (b.initialized) {
          if (b.exhausted) return (Some(Window(expr,
            Edge.exclusive(b.stop.get), Edge.inclusive(b.stop.get))), Some(0))
          return (Some(b.currentWindow(expr)), None)
        }
        val explicitStart = b match {
          case sb: SnapshotBatchStrategy => sb.explicitStart.map(align)
          case _: IncrementalBatchStrategy => bound.valueOpt.map(align)
        }
        val explicitStop = b match {
          case sb: SnapshotBatchStrategy => sb.explicitStop.map(align)
          case _ => None
        }
        // a start seeded from the stored HWM was already consumed by the
        // previous run → the first batch edge must be exclusive (reference
        // hwm_strategy.py:24-31 via batch_hwm_strategy.py:98-106)
        val startIsStoredHwm =
          b.isInstanceOf[IncrementalBatchStrategy] && explicitStart.nonEmpty
        (explicitStart, explicitStop) match {
          case (Some(s0), Some(s1)) =>
            b.initialize(s0, s1, exclusiveStart = startIsStoredHwm)
            (Some(b.currentWindow(expr)), None)
          case _ =>
            val probe = Window(expr,
              startFrom = Edge(explicitStart, including = true),
              stopAt = Edge(explicitStop, including = true))
            val (minV, maxV) = minMax(Some(probe))
            (minV, maxV) match {
              case (Some(mn), Some(mx)) =>
                b.initialize(explicitStart.getOrElse(align(mn)),
                             explicitStop.getOrElse(align(mx)),
                             exclusiveStart = startIsStoredHwm)
                (Some(b.currentWindow(expr)), None)
              case _ => (None, Some(0)) // empty source → empty frame
            }
        }

      case inc: IncrementalStrategy =>
        val start = inc.startEdge
        val probe = Window(expr, startFrom = Edge(start.value, including = true))
        val (_, maxV) = minMax(Some(probe))
        maxV match {
          case Some(mx) =>
            (Some(Window(expr, start, Edge.inclusive(align(mx)))), None)
          case None => (None, Some(0))
        }
    }
  }

  private def minMax(window: Option[Window]): (Option[Any], Option[Any]) =
    connection.getMinMaxValues(source, hwm.get.expression,
      connection.dialect.applyWindow(where, window))
}
