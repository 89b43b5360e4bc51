package graft.dbt

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal
import scala.util.matching.Regex

/** One dbt model's resolved configuration
  * (reference `utils/dbt_mapper.py:12-28`). */
final case class DbtModelInfo(
    name: String,
    schema: String,
    database: String,
    materialized: String,
    physicalName: String,
    path: String,
    dependsOn: Set[String] = Set.empty) {
  def fullName: String = s"$schema.$physicalName"
}

/** Loaded dbt project: model metadata, the 3-tier physical-table → model
  * lookup, source refs, and the dependency edge list. All driver-side —
  * dbt projects are KBs of YAML/SQL; the DataFrames derived from these
  * (edges, table_to_model) are broadcast into the distributed joins
  * (SURVEY.md J1–J4). */
final case class DbtProject(
    models: Map[String, DbtModelInfo],
    tableToModel: Map[String, String],
    sourceRefs: Map[String, String],
    edges: Seq[(String, String)]) {

  /** 3-tier lookup precedence (`dbt_mapper.py:263-300`): exact key, then
    * bare table name, then last-two-parts `schema.table`. */
  def modelFor(tableReference: String): Option[String] = {
    val ref = tableReference.toLowerCase
    tableToModel.get(ref).orElse {
      val parts = ref.split('.').map(_.trim).filter(_.nonEmpty)
      if (parts.isEmpty) None
      else tableToModel.get(parts.last).orElse {
        if (parts.length >= 2)
          tableToModel.get(s"${parts(parts.length - 2)}.${parts.last}")
        else None
      }
    }
  }
}

/** Loads a dbt project from disk, mirroring the reference's two paths:
  * `target/manifest.json` when present (`dbt_mapper.py:145-176`), else a
  * recursive walk of the models dir's SQL + schema.yml files
  * (`dbt_mapper.py:178-261`).
  * Parsing uses jackson (+ YAML factory) — both ship with Spark.
  */
object DbtLoader {
  private val yaml = new ObjectMapper(new YAMLFactory())
  private val json = new ObjectMapper()

  private val ConfigBlockRe: Regex = """\{\{\s*config\([^)]*\)\s*\}\}""".r
  private val RefMacroRe: Regex = """\{\{\s*ref\(['"]([^'"]+)['"]\)\s*\}\}""".r
  private val SourceMacroRe: Regex =
    """\{\{\s*source\(['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\)\s*\}\}""".r

  def load(projectDir: String): DbtProject = {
    val root = Paths.get(projectDir)
    val cfg = loadYaml(root.resolve("dbt_project.yml"))
    val projectName = str(cfg, "name").getOrElse("hyperskill_dbt")
    val modelsCfg = cfg.map(_.path("models"))
    val defaultMaterialized = modelsCfg.flatMap(m => strNode(m, "materialized")).getOrElse("view")

    val sourceRefs = loadSources(root.resolve("models"))

    val manifest = root.resolve("target").resolve("manifest.json")
    val models =
      if (Files.exists(manifest)) fromManifest(manifest, cfg)
      else fromFiles(root, projectName, defaultMaterialized)

    val withDeps = resolveDependencies(root.resolve("models"), models)

    val tableToModel = withDeps.values.flatMap { m =>
      // Manifest path registers only the canonical schema.name
      // (`dbt_mapper.py:176`); the file path registers the bare name too
      // (`dbt_mapper.py:257-259`). We register both uniformly — strictly
      // more resolvable, same precedence semantics.
      Seq(m.name.toLowerCase -> m.name, m.fullName.toLowerCase -> m.name)
    }.toMap

    val edges = withDeps.values.flatMap(m => m.dependsOn.map(d => m.name -> d)).toSeq.sorted

    DbtProject(withDeps, tableToModel, sourceRefs, edges)
  }

  // -------------------------------------------------------------- internals

  private def loadYaml(p: Path): Option[JsonNode] =
    if (!Files.exists(p)) None
    else try Some(yaml.readTree(Files.readString(p))) catch { case NonFatal(_) => None }

  private def str(n: Option[JsonNode], field: String): Option[String] =
    n.flatMap(x => strNode(x, field))

  private def strNode(n: JsonNode, field: String): Option[String] = {
    val v = n.path(field)
    if (v.isMissingNode || v.isNull) None else Some(v.asText())
  }

  /** `sources:` blocks from schema/models/sources.yml
    * (`dbt_mapper.py:94-118`): `source.table` → physical
    * `[db.][schema.]identifier`. */
  private def loadSources(modelsDir: Path): Map[String, String] = {
    if (!Files.exists(modelsDir)) return Map.empty
    val ymls = Files.walk(modelsDir).iterator().asScala
      .filter(p => Set("schema.yml", "models.yml", "sources.yml")
        .contains(p.getFileName.toString))
      .toSeq
    ymls.flatMap { p =>
      loadYaml(p).toSeq.flatMap { node =>
        node.path("sources").elements().asScala.flatMap { src =>
          val sourceName = src.path("name").asText("")
          val schema = src.path("schema").asText("")
          val database = src.path("database").asText("")
          src.path("tables").elements().asScala.flatMap { t =>
            val tableName = t.path("name").asText("")
            if (sourceName.nonEmpty && tableName.nonEmpty) {
              var physical = strNode(t, "identifier").getOrElse(tableName)
              if (schema.nonEmpty) physical = s"$schema.$physical"
              if (database.nonEmpty) physical = s"$database.$physical"
              Some(s"$sourceName.$tableName" -> physical)
            } else None
          }.toSeq
        }.toSeq
      }
    }.toMap
  }

  /** Directory-based schema resolution (`dbt_mapper.py:120-143`):
    * project name minus `_dbt`, with `_private` / `_reports` suffixes. */
  private[dbt] def schemaForPath(relDir: String, projectName: String): String = {
    val base = projectName.replace("_dbt", "")
    val parts = relDir.split('/').filter(_.nonEmpty).toSet
    if (parts.contains("private")) s"${base}_private"
    else if (parts.contains("reports")) s"${base}_reports"
    else base
  }

  private def fromManifest(manifestPath: Path, projectCfg: Option[JsonNode]): Map[String, DbtModelInfo] = {
    val defaultSchema = projectCfg.map(_.path("models"))
      .flatMap(m => strNode(m, "schema")).getOrElse("public")
    val defaultDatabase = projectCfg.map(_.path("models"))
      .flatMap(m => strNode(m, "database")).getOrElse("default")
    try {
      val root = json.readTree(Files.readString(manifestPath))
      root.path("nodes").properties().asScala.flatMap { e =>
        val node = e.getValue
        if (node.path("resource_type").asText() != "model") None
        else {
          val cfg = node.path("config")
          val name = node.path("name").asText("")
          if (name.isEmpty) None
          else {
            val path0 = node.path("original_file_path").asText("")
            val path = if (path0.startsWith("models/")) path0.substring(7) else path0
            Some(name -> DbtModelInfo(
              name = name,
              schema = strNode(cfg, "schema").getOrElse(defaultSchema),
              database = strNode(cfg, "database").getOrElse(defaultDatabase),
              materialized = strNode(cfg, "materialized").getOrElse("view"),
              physicalName = name,
              path = path))
          }
        }
      }.toMap
    } catch { case NonFatal(_) => Map.empty }
  }

  private def fromFiles(root: Path, projectName: String,
                        defaultMaterialized: String): Map[String, DbtModelInfo] = {
    val modelsDir = root.resolve("models")
    if (!Files.exists(modelsDir)) return Map.empty
    val sqlFiles = Files.walk(modelsDir).iterator().asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.toString)
    sqlFiles.map { p =>
      val name = p.getFileName.toString.stripSuffix(".sql")
      val relPath = modelsDir.relativize(p).toString
      val relDir = Option(modelsDir.relativize(p).getParent).map(_.toString).getOrElse("")
      var schema = schemaForPath(relDir, projectName)
      var materialized = defaultMaterialized
      val content = try Files.readString(p) catch { case NonFatal(_) => "" }
      ConfigBlockRe.findFirstIn(content).foreach { block =>
        s"""materialized\\s*=\\s*'([^']*)'""".r.findFirstMatchIn(block)
          .foreach(m => materialized = m.group(1))
        s"""schema\\s*=\\s*'([^']*)'""".r.findFirstMatchIn(block)
          .foreach(m => schema = m.group(1))
      }
      name -> DbtModelInfo(name, schema, "", materialized, name, relPath)
    }.toMap
  }

  /** ref()/source() dependency edges (`dbt_analyzer.py:202-230`): a ref to
    * a known model links both directions; sources become `src.table`
    * dependencies. */
  private def resolveDependencies(modelsDir: Path,
                                  models: Map[String, DbtModelInfo]): Map[String, DbtModelInfo] = {
    if (!Files.exists(modelsDir)) return models
    models.map { case (name, info) =>
      val p = modelsDir.resolve(info.path)
      val content = try Files.readString(p) catch { case NonFatal(_) => "" }
      val refs = RefMacroRe.findAllMatchIn(content).map(_.group(1))
        .filter(models.contains).toSet
      val sources = SourceMacroRe.findAllMatchIn(content)
        .map(m => s"${m.group(1)}.${m.group(2)}").toSet
      name -> info.copy(dependsOn = refs ++ sources)
    }
  }
}
