package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LoaderSpec extends SparkSpec {
  import spark.implicits._

  private def staged(): (GraphEtl, String) = {
    val dir = Files.createTempDirectory("graft-loader-test").toString
    val etl = new GraphEtl(spark, dir)
    etl.parser("fixtures", Map("source" -> "test")) { ctx =>
      ctx.saveNodes(Seq((1L, "Tom"), (2L, "Marie")).toDF("id", "name"), "Person")
      ctx.saveNodes(Seq((10L, "Golf"), (11L, "Polo")).toDF("id", "model"), "Car")
      ctx.saveEdges(Seq((10L, 1L), (11L, 2L), (12L, 7L)).toDF("start", "end"),
        "DRIVED_BY", "Car:id", "Person:id")
    }
    etl.parse()
    (etl, dir)
  }

  test("SparkGraphLoader match strategy drops edges with missing endpoints") {
    val (etl, _) = staged()
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    etl.load(loader)
    assert(loader.nodeTable("Person").get.count() == 2)
    assert(loader.nodeTable("Car").get.count() == 2)
    // edge (12 -> 7): neither endpoint exists -> dropped by MATCH semantics
    assert(loader.edgeTable("DRIVED_BY").get.count() == 2)
    etl.clear()
  }

  test("SparkGraphLoader create strategy synthesizes BlankNode endpoints") {
    val (etl, _) = staged()
    val loader = new SparkGraphLoader(spark, edgeStrategy = "create")
    etl.load(loader)
    assert(loader.edgeTable("DRIVED_BY").get.count() == 3)
    val persons = loader.nodeTable("Person").get
    assert(persons.count() == 3) // Tom, Marie + blank "7"
    assert(persons.where(col("is_blank_node") === true).count() == 1)
    etl.clear()
  }

  test("resume after partial load rebuilds node frames for the in-session loader") {
    val (etl, _) = staged()
    // simulate a crash after every NODE file was loaded and resume-logged
    // but before any edge file: a fresh loader on the resumed run starts
    // with no node frames in memory
    etl.store.catalog.nodes.foreach { case (_, cfg) =>
      cfg.files.keys.foreach(f => etl.store.logAppend("loader", f))
    }
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    etl.load(loader)
    // node frames restored (not re-counted: no loaded_nodes stats)
    assert(loader.nodeTable("Person").get.count() == 2)
    assert(loader.nodeTable("Car").get.count() == 2)
    assert(!etl.store.stats.contains("loaded_nodes_Person"))
    // the edge file still loads against the restored endpoints instead of
    // silently vanishing through an empty MATCH
    assert(loader.edgeTable("DRIVED_BY").get.count() == 2)
    etl.clear()
  }

  test("resume after full load restores EDGE frames too (not only nodes)") {
    val (etl, _) = staged()
    // simulate a crash after everything was loaded and resume-logged: a
    // fresh loader in a new "JVM" must rebuild node AND edge frames —
    // replay the log entries a completed pre-crash run would have written
    etl.store.catalog.nodes.foreach { case (_, cfg) =>
      cfg.files.keys.foreach(f => etl.store.logAppend("loader", f))
    }
    etl.store.catalog.edges.foreach { case (_, files) =>
      files.keys.foreach(f => etl.store.logAppend("loader", f))
    }
    val resumed = new SparkGraphLoader(spark, edgeStrategy = "match")
    etl.load(resumed)
    assert(resumed.nodeTable("Person").get.count() == 2)
    assert(resumed.edgeTable("DRIVED_BY").get.count() == 2) // previously lost
    assert(!etl.store.stats.contains("loaded_edges_DRIVED_BY")) // restored, not re-counted
    etl.clear()
  }

  test("second load() on the same loader instance does not duplicate edges") {
    // GraphEtl.load clears the resume log on success, so a second load()
    // re-offers every file; the loader must recognize files it already
    // merged (r2 ADVICE: edges and HAS_METADATA edges duplicated; nodes
    // only survived via dropDuplicates)
    val (etl, _) = staged()
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match",
      metadataStrategy = "as_edge")
    etl.load(loader)
    val edges1 = loader.edgeTable("DRIVED_BY").get.count()
    val meta1 = loader.edgeTable("HAS_METADATA").get.count()
    etl.load(loader)
    assert(loader.edgeTable("DRIVED_BY").get.count() == edges1)
    assert(loader.edgeTable("HAS_METADATA").get.count() == meta1)
    assert(loader.nodeTable("Person").get.count() == 2)
    // stats still accumulate honestly (the re-load recounts the files)
    etl.clear()
  }

  test("restore after load on the same instance is a no-op (no re-union)") {
    val (etl, _) = staged()
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    etl.load(loader)
    // simulate a resume pass handing the same files back as restores
    etl.store.catalog.edges.foreach { case (_, files) =>
      files.foreach { case (fname, cfg) =>
        loader.restoreEdges(etl.store.edgesDir.resolve(fname).toString,
          "DRIVED_BY", cfg.start, cfg.end, cfg.metadatas, cfg.properties_type)
      }
    }
    assert(loader.edgeTable("DRIVED_BY").get.count() == 2)
    etl.clear()
  }

  test("GraphEtl.load with node-skipping filter loads whitelisted edges as empty") {
    val (etl, _) = staged()
    // after parse: filter out every node file by metadata mismatch
    // (parsers carry source=test), but whitelist the edge type — the edge
    // file loads against deliberately-absent endpoints and must be empty,
    // not a crash
    val f = new GraphFilter().addMetadata("source", "other").addEdge("DRIVED_BY")
    etl.init(filter = Some(f))
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    etl.load(loader)
    assert(loader.nodeTable("Person").isEmpty && loader.nodeTable("Car").isEmpty)
    assert(loader.edgeTable("DRIVED_BY").get.count() == 0)
    etl.clear()
  }

  test("match-strategy edge load against a filter-skipped label is empty, not a crash") {
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    loader.markNodesSkipped("Person")
    val dir = Files.createTempDirectory("graft-loader-skip")
    val f = dir.resolve("e.csv")
    Files.writeString(f, "start;end\n1;2\n")
    val n = loader.loadEdges(f.toString, "KNOWS", "Person:id", "Person:id",
      Map.empty, Map("start" -> "Int64", "end" -> "Int64"))
    assert(n == 0L) // external-DB parity: MATCH on an absent label finds nothing
  }

  test("match-strategy edge load with no node frame fails fast, not limit(0)") {
    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    val dir = Files.createTempDirectory("graft-loader-ff")
    val f = dir.resolve("e.csv")
    Files.writeString(f, "start;end\n1;2\n")
    val ex = intercept[IllegalStateException] {
      loader.loadEdges(f.toString, "KNOWS", "Person:id", "Person:id",
        Map.empty, Map("start" -> "Int64", "end" -> "Int64"))
    }
    assert(ex.getMessage.contains("Person"))
  }

  test("primary key value is canonicalized under property `id` (SURVEY §2.12.3)") {
    val dir = Files.createTempDirectory("graft-loader-pk").toString
    val etl = new GraphEtl(spark, dir)
    etl.parser("pk", Map.empty) { ctx =>
      ctx.saveNodes(Seq(("ORCID1", "X")).toDF("orcid", "name"), "Author", primaryKey = "orcid")
    }
    etl.parse()
    val loader = new SparkGraphLoader(spark)
    etl.load(loader)
    val authors = loader.nodeTable("Author").get
    assert(authors.columns.contains("id"))
    assert(authors.select("id").as[String].head() == "ORCID1")
    etl.clear()
  }

  test("Neo4jLoader generates constraint-before-load Cypher with reference constants") {
    val loader = new Neo4jLoader()
    loader.loadNodes("/tmp/f.csv", "Person", "id", Map("source" -> "s"),
      Map("id" -> "Int64", "name" -> "Utf8"), Seq("id"), Seq("name"))
    val all = loader.statements.mkString("\n")
    assert(all.contains("CREATE CONSTRAINT id_Person IF NOT EXISTS"))
    assert(all.contains("CREATE RANGE INDEX name_Person"))
    assert(all.contains("MERGE (n:Person {id: row.id})"))
    assert(all.contains("toInteger(row.id)"))
    assert(all.contains("batchSize: 50000"))
    assert(all.contains("parallel: false"))
    assert(all.contains("arraySep: '|'"))
    // index/constraint statements precede the load statement
    assert(all.indexOf("CREATE CONSTRAINT") < all.indexOf("apoc.periodic.iterate"))
    // plain-word metadata keys pass through unquoted (byte-identical to the
    // reference for clean schemas — the ident() promise); hostile keys get
    // backticks
    assert(all.contains("source: 's'"))
    val hostile = new Neo4jLoader()
    hostile.loadNodes("/tmp/f.csv", "Person", "id", Map("my key" -> "v"),
      Map("id" -> "Int64"), Nil, Nil)
    assert(hostile.statements.mkString("\n").contains("`my key`: 'v'"))
  }

  test("Neo4jLoader edge Cypher honors match/create strategies and 20k batches") {
    val m = new Neo4jLoader(edgeStrategy = "match")
    m.loadEdges("/tmp/e.csv", "KNOWS", "Person:id", "Person:id", Map.empty,
      Map("start" -> "Int64", "end" -> "Utf8"))
    assert(m.statements.head.contains("MATCH (n:Person"))
    assert(m.statements.head.contains("batchSize: 20000"))
    assert(m.statements.head.contains("row.start <> '' AND row.end <> ''"))
    val c = new Neo4jLoader(edgeStrategy = "create")
    c.loadEdges("/tmp/e.csv", "KNOWS", "Person:id", "Person:id", Map.empty, Map.empty)
    assert(c.statements.head.contains("ON CREATE SET n:BlankNode"))
  }

  test("TigerGraphLoader generates schema-change and loading jobs") {
    val loader = new TigerGraphLoader()
    loader.loadNodes("/data/f.csv", "Person", "id", Map.empty,
      Map("id" -> "Int64", "name" -> "Utf8", "tags" -> "List(Utf8)"), Nil, Nil)
    val all = loader.statements.mkString("\n")
    assert(all.contains("ADD VERTEX Person"))
    assert(all.contains("PRIMARY_ID id INT"))
    assert(all.contains("tags LIST<STRING>"))
    assert(all.contains("metadatas MAP<STRING, STRING>"))
    assert(all.contains("""separator=";""""))
    loader.loadEdges("/data/e.csv", "KNOWS", "Person:id", "Person:id", Map.empty, Map.empty)
    assert(loader.statements.exists(_.contains("ADD UNDIRECTED EDGE KNOWS (FROM Person, TO Person)")))
  }

  test("TigerGraphLoader parses loaded counts from gsql output when a runner is wired") {
    // the summary-table shape the reference parses (tigergraph_loader.py:160):
    // line containing ".csv |", cell index 3 after a '|' split
    val gsqlOut =
      """Using graph 'g'
        |  [============] 100%
        ||       FILENAME |   LOADED LINES |   LOADED OBJECTS |   ERROR LINES |
        ||    /data/f.csv |           1501 |             1500 |             0 |
        |Job finished.""".stripMargin
    assert(TigerGraphLoader.parseLoadedCount(gsqlOut) == 1500L)
    // malformed / server-less output degrades to 0, never throws mid-load
    assert(TigerGraphLoader.parseLoadedCount("no table here") == 0L)
    assert(TigerGraphLoader.parseLoadedCount("| x.csv | only-two |") == 0L)
    // executable path: a wired runner sees the loading job and its count
    // feeds the loader's return value (what GraphEtl.load records in stats)
    var seen = Vector.empty[String]
    val loader = new TigerGraphLoader(gsqlRunner = Some { stmt =>
      seen :+= stmt; gsqlOut
    })
    val n = loader.loadNodes("/data/f.csv", "Person", "id", Map.empty,
      Map("id" -> "Int64"), Nil, Nil)
    assert(n == 1500L)
    assert(seen.exists(_.contains("RUN LOADING JOB load_Person")))
    val e = loader.loadEdges("/data/e.csv", "KNOWS", "Person:id", "Person:id",
      Map.empty, Map.empty)
    assert(e == 1500L)
  }

  test("metadata strategies: as_property adds columns, as_edge creates Metadata nodes") {
    // as_property
    val (etl1, _) = staged()
    val prop = new SparkGraphLoader(spark, metadataStrategy = "as_property")
    etl1.load(prop)
    val persons = prop.nodeTable("Person").get
    assert(persons.columns.contains("source"))
    assert(persons.select("source").distinct().as[String].head() == "test")
    etl1.clear()
    // as_edge — reference test_loader.py:26-42 semantics
    val (etl2, _) = staged()
    val asEdge = new SparkGraphLoader(spark, metadataStrategy = "as_edge")
    etl2.load(asEdge)
    val meta = asEdge.nodeTable("Metadata").get
    assert(meta.count() == 1)
    assert(meta.columns.contains("source"))
    val metaEdges = asEdge.edgeTable("HAS_METADATA").get
    assert(metaEdges.count() == 4) // 2 Person + 2 Car nodes link to the metadata node
    etl2.clear()
  }

  test("connection config merges kwargs over defaults, caches, and reloads") {
    val dir = Files.createTempDirectory("graft-conn").toString
    val c1 = ConnectionConfig.resolve(dir, ConnectionConfig.Neo4jDefaults,
      Map("host" -> "bolt://db:7687", "password" -> "s3cret"))
    assert(c1("url") == "bolt://db:7687") // host aliased to url
    assert(c1("password") == "s3cret")
    assert(c1("username") == "neo4j") // default preserved
    // no kwargs -> cached file is reloaded
    val c2 = ConnectionConfig.resolve(dir, ConnectionConfig.Neo4jDefaults)
    assert(c2 == c1)
  }

  test("OWL and SHACL exporters render the staged schema") {
    val owl = new OwlCallback(functionalProps = Set("name"))
    val shacl = new ShaclCallback(functionalProps = Set("name"))
    Seq(owl, shacl).foreach { cb =>
      cb.onSaveNodes("Person", Map("id" -> "Int64", "name" -> "Utf8"),
        Map("source" -> "test"), "id", Seq("id"), Nil)
      cb.onSaveEdges("KNOWS", "Person", "Person", Map.empty, Map.empty)
    }
    val owlText = owl.render()
    assert(owlText.contains(":Person a owl:Class ; rdfs:subClassOf owl:Thing"))
    assert(owlText.contains("owl:FunctionalProperty"))
    assert(owlText.contains(":KNOWS a owl:ObjectProperty"))
    val ttl = shacl.render()
    assert(ttl.contains(":PersonShape a sh:NodeShape"))
    assert(ttl.contains("sh:closed true"))
    // closed shapes must exempt rdf:type or every typed instance fails
    assert(ttl.contains("sh:ignoredProperties ( rdf:type )"))
    assert(ttl.contains("sh:maxCount 1"))
    assert(ttl.contains("sh:nodeKind sh:IRI"))
  }

  test("exporters percent-encode names that are not valid Turtle local parts") {
    val owl = new OwlCallback()
    owl.onSaveNodes("My Label", Map("first name" -> "Utf8", "price($)" -> "Float64"),
      Map.empty, "first name", Nil, Nil)
    val text = owl.render()
    assert(text.contains(":My%20Label a owl:Class"))
    assert(text.contains(":first%20name a owl:DatatypeProperty"))
    assert(text.contains(":price%28%24%29"))
    assert(!text.contains(": price")) // no bare space leaked into a name
  }

  test("connection config rejects multi-line values instead of truncating on reload") {
    val dir = Files.createTempDirectory("graft-conn-nl").toString
    val ex = intercept[IllegalArgumentException] {
      ConnectionConfig.resolve(dir, ConnectionConfig.Neo4jDefaults,
        Map("password" -> "abc\ndef"))
    }
    assert(ex.getMessage.contains("single-line"))
  }
}
