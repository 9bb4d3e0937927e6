package graft.files

import java.nio.file.FileSystems
import java.time.Instant
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import graft.core.{FileListHwm, FileMTimeHwm, Hwm}

/** File filters applied during the remote walk
  * (reference onetl/file/filter/). Stateless predicates. */
trait FileFilter {
  def matches(entry: RemoteEntry): Boolean
  /** Whether this filter prunes a whole directory subtree. */
  def prunesDir(path: String): Boolean = false
}

object FileFilter {
  /** Conjunction (reference filter/match_all_filters.py). */
  def matchesAll(filters: Seq[FileFilter], entry: RemoteEntry): Boolean =
    filters.forall(_.matches(entry))
}

/** fnmatch on the file NAME (reference filter/glob.py:16). */
final case class Glob(pattern: String) extends FileFilter {
  private val matcher = FileSystems.getDefault.getPathMatcher(s"glob:$pattern")
  def matches(e: RemoteEntry): Boolean =
    matcher.matches(java.nio.file.Paths.get(e.name))
}

/** Case-insensitive regex SEARCH on the full path
  * (reference filter/regexp.py:17). */
final case class Regexp(pattern: String) extends FileFilter {
  private val re = ("(?i)" + pattern).r
  def matches(e: RemoteEntry): Boolean = re.findFirstIn(e.path).isDefined
}

/** Prune a subtree (reference filter/exclude_dir.py:16). */
final case class ExcludeDir(dir: String) extends FileFilter {
  private val norm = dir.stripSuffix("/")
  def matches(e: RemoteEntry): Boolean =
    !(e.path == norm || e.path.startsWith(norm + "/"))
  override def prunesDir(path: String): Boolean =
    path == norm || path.startsWith(norm + "/")
}

/** min/max on st_size (reference filter/file_size.py:18). */
final case class FileSizeRange(min: Option[Long] = None,
                               max: Option[Long] = None) extends FileFilter {
  def matches(e: RemoteEntry): Boolean =
    min.forall(e.stat.size >= _) && max.forall(e.stat.size <= _)
}

/** since/until on st_mtime (reference filter/file_mtime.py:19). */
final case class FileModifiedTime(since: Option[Instant] = None,
                                  until: Option[Instant] = None) extends FileFilter {
  def matches(e: RemoteEntry): Boolean =
    since.forall(s => !e.stat.mtime.isBefore(s)) &&
      until.forall(u => !e.stat.mtime.isAfter(u))
}

/** Drop files already covered by a file HWM
  * (reference filter/file_hwm.py:11-33). */
final case class FileHwmFilter(hwm: Hwm) extends FileFilter {
  def matches(e: RemoteEntry): Boolean = hwm match {
    case h: FileListHwm => !h.covers(e.path)
    case h: FileMTimeHwm => !h.covers(e.stat.mtime)
    case other => throw new IllegalArgumentException(
      s"FileHwmFilter needs a file HWM, got ${other.getClass.getSimpleName}")
  }
}

/** Stateful walk limits — stop the traversal, not just the result
  * (reference onetl/file/limit/: stops_at/reset/limits_reached). */
trait FileLimit {
  def reset(): Unit
  /** True if accepting `entry` would exceed the limit (entry excluded). */
  def stopsAt(entry: RemoteEntry): Boolean
  def reached: Boolean
}

/** Stop after N files (reference limit/max_files_count.py:18). */
final case class MaxFilesCount(limit: Int) extends FileLimit {
  private val n = new AtomicLong(0)
  private val hit = new AtomicBoolean(false)
  def reset(): Unit = { n.set(0); hit.set(false) }
  def stopsAt(e: RemoteEntry): Boolean =
    if (n.incrementAndGet() > limit) { hit.set(true); true } else false
  def reached: Boolean = hit.get
}

/** Stop after Σ size bytes (reference limit/total_files_size.py:20). */
final case class TotalFilesSize(limitBytes: Long) extends FileLimit {
  private val sum = new AtomicLong(0)
  private val hit = new AtomicBoolean(false)
  def reset(): Unit = { sum.set(0); hit.set(false) }
  def stopsAt(e: RemoteEntry): Boolean =
    if (sum.addAndGet(e.stat.size) > limitBytes) { hit.set(true); true } else false
  def reached: Boolean = hit.get
}
