package graft.hooks

import java.util.ServiceLoader
import scala.jdk.CollectionConverters._

/** Plugin discovery via the standard JVM ServiceLoader — the reference
  * imports plugins through Python entry points with env-var allow/deny
  * lists (onetl/plugins/import_plugins.py:17-60); `ServiceLoader` is the
  * JVM-native equivalent (SURVEY §2.8). Ship a
  * `META-INF/services/graft.hooks.GraftListener` file in a plugin jar and
  * it registers on `loadAll()`.
  *
  * Env guards mirror the reference: GRAFT_PLUGINS_WHITELIST /
  * GRAFT_PLUGINS_BLACKLIST are comma-separated class-name filters.
  */
object GraftPlugins {
  def loadAll(env: Map[String, String] = sys.env): Seq[GraftListener] = {
    val allow = env.get("GRAFT_PLUGINS_WHITELIST")
      .map(_.split(",").map(_.trim).toSet)
    val deny = env.get("GRAFT_PLUGINS_BLACKLIST")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val loaded = ServiceLoader.load(classOf[GraftListener]).asScala.toSeq
      .filter { l =>
        val name = l.getClass.getName
        !deny.contains(name) && allow.forall(_.contains(name))
      }
    loaded.foreach(GraftListeners.register)
    loaded
  }
}
