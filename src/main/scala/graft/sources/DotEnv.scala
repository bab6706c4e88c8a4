package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** `.env` file support — the reference spec's first-class credential
  * posture (/root/reference/README.md:17-18, 91-93: secrets live in a
  * dotenv file, never inline in code or logs).
  *
  * Grammar (the de-facto dotenv dialect): one `KEY=VALUE` per line;
  * blank lines and `#` comments ignored; an optional `export ` prefix
  * tolerated; single- or double-quoted values unquoted (quotes also stop
  * an inline ` # comment` from being truncated into the value).
  *
  * Resolution order is 12-factor: the REAL process environment wins over
  * the file, so a deployment can override a checked-in default without
  * editing it. Values are held privately and never appear in `toString`,
  * logs, or plan descriptions — [[Secrets.resolve]] is the only reader.
  */
object DotEnv {

  /** Parsed, memoized per (path, mtime) so executor-side readers re-parse
    * only when the file actually changes. Superseded-mtime entries are
    * never evicted — the map is bounded by distinct (file, version) pairs
    * seen in one JVM, i.e. a handful; a long-lived service rotating env
    * files continuously should evict by path on change. */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Map[String, String]]

  def parse(path: String): Map[String, String] = {
    val p = Paths.get(path)
    require(Files.isReadable(p), s"env file not readable: $path")
    val mtime = Files.getLastModifiedTime(p).toMillis
    cache.getOrElseUpdate((path, mtime), {
      Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
        .map(l => if (l.startsWith("export ")) l.stripPrefix("export ").trim else l)
        .flatMap { l =>
          val eq = l.indexOf('=')
          val key = l.substring(0, eq).trim
          var value = l.substring(eq + 1).trim
          if (value.length >= 2 &&
              ((value.head == '"' && value.last == '"') ||
               (value.head == '\'' && value.last == '\''))) {
            value = value.substring(1, value.length - 1)
          } else {
            // unquoted value: strip an inline comment
            val hash = value.indexOf(" #")
            if (hash >= 0) value = value.substring(0, hash).trim
          }
          if (key.isEmpty) None else Some(key -> value)
        }.toMap
    })
  }
}

/** Secret resolution for the REST connector: an env-var NAME (never a
  * value) travels in reader options / serialized configs; the value is
  * looked up at request time from the real environment first, then an
  * optional `.env` file. The value itself never renders anywhere. */
private[sources] case class Secrets(envFile: Option[String]) {
  def resolve(name: String): Option[String] =
    sys.env.get(name).orElse(envFile.flatMap(f => DotEnv.parse(f).get(name)))
  // a serialized Secrets in a plan/task description must not hint at values
  override def toString: String = s"Secrets(envFile=${envFile.isDefined})"
}
