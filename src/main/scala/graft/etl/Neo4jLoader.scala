package graft.etl

import scala.collection.mutable

/** Cypher bulk-load text generation — parity with
  * graph_etl/neo4j_loader.py. In this sandbox there is no reachable Neo4j,
  * so the loader is a pure generator (mirrors the reference's own graceful
  * no-DB degradation in tests/test_loader.py:10-13): every statement it
  * would run is appended to `statements` for golden-string testing /
  * external execution. Row counts are not known without a server, so load
  * methods return 0 and the caller's catalog keeps the staged counts.
  *
  * Key constants carried from the reference: node tx batch 50,000
  * (neo4j_loader.py:164), edge tx batch 20,000 (:286), `parallel: false`
  * (:164), array separator `|` (:152), server-local `file:/` CSV ingestion
  * (:160).
  */
final class Neo4jLoader(
    metadataStrategy: String = "as_property", // or "as_edge" (neo4j_loader.py:174-178)
    edgeStrategy: String = "match" // or "create" (:265-276)
  ) extends Loader {

  val statements: mutable.Buffer[String] = mutable.Buffer.empty

  /** Escape backslashes and quotes before interpolating into a Cypher
    * string literal — metadata values and file paths are user-controlled,
    * and an unescaped quote breaks the statement (and is an injection
    * vector for untrusted metadata). Double quotes must be escaped too:
    * the inner statement is itself embedded in the double-quoted
    * `apoc.periodic.iterate` argument. */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'").replace("\"", "\\\"")

  /** Backtick-quote a Cypher identifier (label, property, constraint name)
    * unless it is a plain word — keeps generated text byte-identical to
    * the reference for clean schemas while making hostile column/label
    * names (spaces, quotes, injection attempts) syntactically inert. */
  private def ident(s: String): String =
    if (s.matches("[A-Za-z_][A-Za-z0-9_]*")) s
    else "`" + s.replace("`", "``") + "`"

  /** Polars-dtype-name -> Cypher conversion fn (neo4j_loader.py:14-27). */
  private def cypherCast(dtype: String, ref: String): String = dtype match {
    case d if d.startsWith("Int")   => s"toInteger($ref)"
    case d if d.startsWith("Float") => s"toFloat($ref)"
    case "Boolean"                  => s"toBoolean($ref)"
    case "Datetime"                 => s"datetime($ref)"
    case "Date"                     => s"date($ref)"
    case "List(Utf8)"               => ref // arraySep handles expansion
    case _                          => ref
  }

  override def loadNodes(
      filePath: String, label: String, primaryKey: String,
      metadatas: Map[String, String], propertiesType: Map[String, String],
      constraints: Seq[String], indexs: Seq[String]): Long = {
    // constraints / indexes before the MERGE-heavy load so MERGE stays
    // O(log n) per row (neo4j_loader.py:178-192)
    constraints.foreach { c =>
      statements += s"CREATE CONSTRAINT ${ident(c + "_" + label)} IF NOT EXISTS FOR (n:${ident(label)}) REQUIRE n.${ident(c)} IS UNIQUE"
    }
    indexs.foreach { i =>
      statements += s"CREATE RANGE INDEX ${ident(i + "_" + label)} IF NOT EXISTS FOR (n:${ident(label)}) ON (n.${ident(i)})"
    }
    val props = propertiesType.toSeq.sortBy(_._1).map { case (p, t) =>
      s"${ident(p)}: ${cypherCast(t, s"row.${ident(p)}")}"
    }.mkString(", ")
    val metaProps = metadatas.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${ident(k)}: '${esc(v)}'" }.mkString(", ")
    val metaSet = metadataStrategy match {
      case "as_edge" =>
        s"MERGE (m:Metadata {$metaProps}) CREATE (n)-[:HAS_METADATA]->(m)"
      case _ =>
        if (metadatas.isEmpty) "" else s"SET n += {$metaProps}"
    }
    // MERGE key canonicalized to property `id` regardless of primaryKey
    // (neo4j_loader.py:161,170 — SURVEY §2.12.3)
    statements +=
      s"""CALL apoc.periodic.iterate(
         |  "CALL apoc.load.csv('file:/${esc(filePath)}', {sep: ';', arraySep: '|'}) YIELD map AS row WITH row WHERE row.${ident(primaryKey)} IS NOT NULL RETURN row",
         |  "MERGE (n:${ident(label)} {id: row.${ident(primaryKey)}}) SET n += {$props} $metaSet",
         |  {batchSize: 50000, iterateList: true, parallel: false})""".stripMargin
    0L
  }

  override def loadEdges(
      filePath: String, edgeType: String, start: String, end: String,
      metadatas: Map[String, String], propertiesType: Map[String, String]): Long = {
    val startLabel = start.split(":")(0)
    val endLabel = end.split(":")(0)
    val startCast = cypherCast(propertiesType.getOrElse("start", "Utf8"), "row.start")
    val endCast = cypherCast(propertiesType.getOrElse("end", "Utf8"), "row.end")
    val props = (propertiesType -- Seq("start", "end")).toSeq.sortBy(_._1)
      .map { case (p, t) => s"${ident(p)}: ${cypherCast(t, s"row.${ident(p)}")}" }.mkString(", ")
    val endpoints = edgeStrategy match {
      case "create" =>
        s"MERGE (n:${ident(startLabel)} {id: $startCast}) ON CREATE SET n:BlankNode " +
          s"MERGE (m:${ident(endLabel)} {id: $endCast}) ON CREATE SET m:BlankNode"
      case _ =>
        s"MATCH (n:${ident(startLabel)} {id: $startCast}) MATCH (m:${ident(endLabel)} {id: $endCast})"
    }
    statements +=
      s"""CALL apoc.periodic.iterate(
         |  "CALL apoc.load.csv('file:/${esc(filePath)}', {sep: ';', arraySep: '|'}) YIELD map AS row WITH row WHERE row.start <> '' AND row.end <> '' RETURN row",
         |  "$endpoints CREATE (n)-[:${ident(edgeType)} {$props}]->(m)",
         |  {batchSize: 20000, iterateList: true, parallel: false})""".stripMargin
    0L
  }
}

/** GSQL bulk-load text generation — parity with
  * graph_etl/tigergraph_loader.py (schema-change job :139-149,239-251 and
  * loading job :151-165,253-267). Pure generator, like [[Neo4jLoader]].
  *
  * @param gsqlRunner optional gsql client: given a statement batch, runs it
  *   against a live TigerGraph and returns the textual gsql output. When
  *   present, load methods execute each statement as it is generated and
  *   return the loaded-row count parsed from the RUN LOADING JOB output
  *   (tigergraph_loader.py:159-160); when absent (no server reachable —
  *   this environment), they return 0 and the caller's catalog keeps the
  *   authoritative staged counts. Statement GENERATION is identical either
  *   way, which is what the golden tests pin. */
final class TigerGraphLoader(gsqlRunner: Option[String => String] = None) extends Loader {

  val statements: mutable.Buffer[String] = mutable.Buffer.empty

  /** Record a generated statement and, when a gsql client is configured,
    * run it and hand back its output (generation-only mode returns None) —
    * statements are passed explicitly, never re-read from the buffer, so
    * generation order can change without silently re-batching the wrong
    * statements into the runner. */
  private def emit(statement: String): Option[String] = {
    statements += statement
    gsqlRunner.map(_(statement))
  }

  /** Escape backslashes and double quotes before interpolating into a
    * double-quoted GSQL string literal (file paths, metadata constants) —
    * same injection/breakage class the Cypher generator guards against. */
  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Polars-dtype-name -> GSQL attribute type (tigergraph_loader.py:14-25). */
  private def gsqlType(dtype: String): String = dtype match {
    case d if d.startsWith("Int")   => "INT"
    case d if d.startsWith("Float") => "FLOAT"
    case "Boolean"                  => "BOOL"
    case "Date" | "Datetime"        => "DATETIME"
    case "List(Utf8)"               => "LIST<STRING>"
    case _                          => "STRING"
  }

  override def loadNodes(
      filePath: String, label: String, primaryKey: String,
      metadatas: Map[String, String], propertiesType: Map[String, String],
      constraints: Seq[String], indexs: Seq[String]): Long = {
    val attrs = (propertiesType - primaryKey).toSeq.sortBy(_._1)
      .map { case (p, t) => s"$p ${gsqlType(t)}" }
    val attrList = (attrs :+ "metadatas MAP<STRING, STRING>").mkString(", ")
    emit(
      s"""CREATE SCHEMA_CHANGE JOB add_$label {
         |  ADD VERTEX $label (PRIMARY_ID $primaryKey ${gsqlType(propertiesType.getOrElse(primaryKey, "Utf8"))}, $attrList) WITH primary_id_as_attribute="true";
         |} RUN SCHEMA_CHANGE JOB add_$label DROP JOB add_$label""".stripMargin)
    // the metadatas MAP attribute is fed a constant rendered from the
    // file's metadata, like the reference's `"{metadatas}"` literal
    // (tigergraph_loader.py:155) — VALUES arity must match the vertex schema
    val metaConst = "\"" +
      esc(metadatas.toSeq.sortBy(_._1).map { case (k, v) => s"$k: $v" }.mkString("{", ", ", "}")) + "\""
    val cols = ((primaryKey +: (propertiesType - primaryKey).keys.toSeq.sorted)
      .map(c => s"$$\"$c\"") :+ metaConst).mkString(", ")
    // loaded count comes from THIS loading job's gsql output
    // (tigergraph_loader.py:158-160: run, then parse the summary table)
    emit(
      s"""CREATE LOADING JOB load_$label FOR GRAPH g {
         |  DEFINE FILENAME f = "${esc(filePath)}";
         |  LOAD f TO VERTEX $label VALUES($cols) USING header="true", separator=";";
         |} RUN LOADING JOB load_$label DROP JOB load_$label""".stripMargin)
      .map(TigerGraphLoader.parseLoadedCount).getOrElse(0L)
  }

  override def loadEdges(
      filePath: String, edgeType: String, start: String, end: String,
      metadatas: Map[String, String], propertiesType: Map[String, String]): Long = {
    val startLabel = start.split(":")(0)
    val endLabel = end.split(":")(0)
    val attrs = (propertiesType -- Seq("start", "end")).toSeq.sortBy(_._1)
      .map { case (p, t) => s"$p ${gsqlType(t)}" }.mkString(", ")
    emit(
      s"""CREATE SCHEMA_CHANGE JOB add_$edgeType {
         |  ADD UNDIRECTED EDGE $edgeType (FROM $startLabel, TO $endLabel${if (attrs.isEmpty) "" else ", " + attrs});
         |} RUN SCHEMA_CHANGE JOB add_$edgeType DROP JOB add_$edgeType""".stripMargin)
    val cols = ("start" +: "end" +: (propertiesType -- Seq("start", "end")).keys.toSeq.sorted)
      .map(c => s"$$\"$c\"").mkString(", ")
    emit(
      s"""CREATE LOADING JOB load_$edgeType FOR GRAPH g {
         |  DEFINE FILENAME f = "${esc(filePath)}";
         |  LOAD f TO EDGE $edgeType VALUES($cols) USING header="true", separator=";";
         |} RUN LOADING JOB load_$edgeType DROP JOB load_$edgeType""".stripMargin)
      .map(TigerGraphLoader.parseLoadedCount).getOrElse(0L)
  }
}

object TigerGraphLoader {
  /** Loaded-row count from gsql RUN LOADING JOB output: the first summary
    * row naming the csv file — `| file.csv | <lines> | <loaded> | ... |` —
    * column 3 (tigergraph_loader.py:160's
    * `int(line for ".csv |" in line).split("|")[3]`, made total: no
    * matching line or a non-numeric cell yields 0 instead of throwing
    * mid-load). */
  def parseLoadedCount(gsqlOutput: String): Long =
    gsqlOutput.linesIterator
      .find(_.contains(".csv |"))
      .flatMap { line =>
        val cells = line.split('|')
        if (cells.length > 3) cells(3).trim.toLongOption else None
      }
      .getOrElse(0L)
}
