package graft.etl

import java.nio.file.{Files, Paths}
import scala.collection.immutable.ListMap

/** Connection-config cache — parity with the reference's per-loader config
  * handling (graph_etl/neo4j_loader.py:58-97, tigergraph_loader.py:50-84):
  * caller kwargs (with `host`/`uri` aliased to `url`) are merged over
  * defaults and cached to `{outputDir}/config.yaml`; with no kwargs the
  * cached file is reloaded. Driver-side only.
  *
  * The YAML is the flat `key: value` subset — no external YAML dependency
  * needed (zero-egress build), and it round-trips with the reference's
  * files for this shape. */
object ConnectionConfig {

  val Neo4jDefaults: Map[String, String] = ListMap(
    "url" -> "bolt://localhost:7687",
    "username" -> "neo4j",
    "password" -> "password",
    "database" -> "neo4j")

  val TigerGraphDefaults: Map[String, String] = ListMap(
    "url" -> "http://localhost:14240",
    "username" -> "tigergraph",
    "password" -> "tigergraph",
    "graph" -> "g")

  /** Alias host/uri to url like neo4j_loader.py:58-61. */
  def normalize(kwargs: Map[String, String]): Map[String, String] = {
    var k = kwargs
    k.get("host").foreach(v => k += ("url" -> v))
    k.get("uri").foreach(v => k += ("url" -> v))
    k -- Seq("host", "uri")
  }

  def resolve(
      outputDir: String,
      defaults: Map[String, String],
      kwargs: Map[String, String] = Map.empty): Map[String, String] = {
    val path = Paths.get(outputDir, "config.yaml")
    val merged =
      if (kwargs.nonEmpty) defaults ++ normalize(kwargs)
      else if (Files.exists(path)) defaults ++ load(path.toString)
      else defaults
    Files.createDirectories(Paths.get(outputDir))
    Files.writeString(path, render(merged))
    merged
  }

  private[etl] def render(config: Map[String, String]): String = {
    // the cache is line-based YAML-lite: a value with a newline would
    // silently truncate on reload (the continuation line has no colon and
    // is dropped) — reject loudly instead of corrupting credentials
    config.foreach { case (k, v) =>
      require(!k.exists(c => c == '\n' || c == '\r') && !v.exists(c => c == '\n' || c == '\r'),
        s"connection config entry '$k' must be single-line to round-trip through config.yaml")
    }
    config.map { case (k, v) => s"$k: $v" }.mkString("", "\n", "\n")
  }

  private[etl] def load(path: String): Map[String, String] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(Paths.get(path))).asScala
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.take(i).trim -> l.drop(i + 1).trim
      }.to(ListMap)
}
