package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.{GraphEtl, SparkGraphLoader}
import graft.graph.GraphOps

/** The reference's example workload shape end-to-end (example/imdb.py →
  * SURVEY §7.2 M0 "golden slice"): movies + exploded actor lists → staged
  * node/edge files with auto Person:name → Person:id endpoint resolution →
  * in-session load → GraphX materialization → "top actor by movie count".
  * Exercises S3/S4, P1-P7, F1-F4, A1-A4, W1, K1/K2/K4, J2/J4, X1/X3, C1-C3
  * in one path. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("movie graph: parse -> map -> load -> GraphX top actor") {
    val dir = Files.createTempDirectory("graft-e2e").toString
    val etl = new GraphEtl(spark, dir)

    val movies = Seq(
      (1L, "Heat", "Mann", "Al Pacino, Robert De Niro, Val Kilmer"),
      (2L, "The Irishman", "Scorsese", "Robert De Niro, Al Pacino, Joe Pesci"),
      (3L, "Serpico", "Lumet", "Al Pacino"),
      (4L, "Casino", "Scorsese", "Robert De Niro, Joe Pesci")
    ).toDF("rank", "title", "director", "actors")

    etl.parser("imdb", Map("source" -> "imdb", "licence" -> "CC0")) { ctx =>
      // Movie nodes (pk = rank, like the example's Rank -> Movie.id)
      ctx.saveNodes(movies.select(col("rank").as("id"), col("title")), "Movie")
      // Person nodes from the exploded actor list (F3 split + F4 explode),
      // ids assigned by dense numbering of distinct names
      val actors = movies
        .select(explode(split(col("actors"), ", ")).as("name"))
        .distinct()
      val persons = actors.withColumn("id", abs(xxhash64(col("name"))))
      ctx.saveNodes(persons.select(col("id"), col("name")), "Person")
      // ACTED_IN edges address Person by NAME -> auto pk-resolution (J2)
      val acted = movies
        .select(col("rank").as("start"), explode(split(col("actors"), ", ")).as("end"))
      ctx.saveEdges(acted, "ACTED_IN", "Movie:id", "Person:name")
    }
    etl.parse()

    // catalog: endpoint repointed by the auto-mapping pass
    val (_, edgeCfg) = etl.store.catalog.edges("ACTED_IN").head
    assert(edgeCfg.end == "Person:id")
    assert(etl.store.catalog.nodes.keySet == Set("Movie", "Person"))

    val loader = new SparkGraphLoader(spark, edgeStrategy = "match")
    etl.load(loader)
    val nodes = loader.nodes.get.cache()
    val edges = loader.edges.get.cache()
    assert(nodes.where(col("label") === "Movie").count() == 4)
    assert(nodes.where(col("label") === "Person").count() == 4)
    assert(edges.count() == 9) // all endpoints resolve after auto-mapping

    // GraphX: actor in-degree = movie count; Pacino and De Niro tie at 3
    val degrees = GraphOps.degrees(nodes, edges)
    val topActors = degrees.where(col("label") === "Person")
      .join(nodes.where(col("label") === "Person").select(col("id"), col("name")), "id")
      .orderBy(col("in_deg").desc, col("name"))
      .select("name").as[String].collect()
    assert(topActors.take(2).toSet == Set("Al Pacino", "Robert De Niro"))

    // the full GraphX materialization also agrees
    val g = GraphOps.toGraphX(nodes, edges)
    assert(g.numVertices == 8 && g.numEdges == 9)
    etl.clear()
  }

  test("cross-parser auto-mapping: edges staged by one parser resolve against nodes from another") {
    // the reference's example/main.py shape: the oscars parser emits
    // AWARDED_FOR edges addressed by Person:name, while Person nodes come
    // from the separately-registered imdb parser
    val dir = Files.createTempDirectory("graft-e2e-cross").toString
    val etl = new GraphEtl(spark, dir)

    etl.parser("people", Map("source" -> "imdb")) { ctx =>
      ctx.saveNodes(Seq(
        (1L, "Katharine Hepburn"), (2L, "Spencer Tracy"), (3L, "Humphrey Bogart")
      ).toDF("id", "name"), "Person")
    }
    etl.parser("oscars", Map("source" -> "oscars")) { ctx =>
      ctx.saveNodes(Seq(
        ("BEST ACTRESS", 1934L), ("BEST ACTOR", 1952L)
      ).toDF("category", "year").withColumnRenamed("category", "id"), "Award")
      ctx.saveEdges(Seq(
        ("Katharine Hepburn", "BEST ACTRESS"),
        ("Humphrey Bogart", "BEST ACTOR")
      ).toDF("start", "end"), "AWARDED_FOR", "Person:name", "Award:id")
    }
    etl.parse()

    val (_, cfg) = etl.store.catalog.edges("AWARDED_FOR").head
    assert(cfg.start == "Person:id") // repointed across parsers
    val loader = new SparkGraphLoader(spark)
    etl.load(loader)
    val edges = loader.edgeTable("AWARDED_FOR").get
    assert(edges.count() == 2)
    val starts = edges.select(col("src")).as[String].collect().toSet
    assert(starts == Set("1", "3")) // Hepburn and Bogart ids, not names
    etl.clear()
  }
}
