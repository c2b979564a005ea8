package graft.etl

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** OWL2 ontology export of the staged schema — parity with the reference's
  * `OwlReadyCallback` (graph_etl/callbacks.py:33-128): per node label an
  * `owl:Thing` subclass; per property a typed (Functional)Property; per
  * metadata key an AnnotationProperty; per edge an ObjectProperty with
  * optional characteristics and inverse. Driver-side text writer — it walks
  * the catalog, never the data, so it is O(schema) at any data scale.
  *
  * Emitted as OWL/Turtle to `{outputDir}/file.owl` (callbacks.py:120-128).
  */
final class OwlCallback(
    functionalProps: Set[String] = Set.empty,
    edgeTraits: Map[String, Seq[String]] = Map.empty, // type -> e.g. Seq("TransitiveProperty")
    inverseOf: Map[String, String] = Map.empty
  ) extends SchemaCallback {

  /** Catalog dtype -> XSD datatype; unsupported types dropped like the
    * reference (callbacks.py:43-55 maps only str/float/int/bool). */
  private def xsd(dtype: String): Option[String] = dtype match {
    case "Utf8"                     => Some("xsd:string")
    case d if d.startsWith("Int")   => Some("xsd:integer")
    case d if d.startsWith("Float") => Some("xsd:double")
    case "Boolean"                  => Some("xsd:boolean")
    case _                          => None
  }

  private val nodeDefs = mutable.LinkedHashMap.empty[String, (Map[String, String], Map[String, String])]
  private val edgeDefs = mutable.LinkedHashMap.empty[String, (String, String)]

  override def onSaveNodes(label: String, propertiesType: Map[String, String],
      metadatas: Map[String, String], primaryKey: String,
      constraints: Seq[String], indexs: Seq[String]): Unit =
    nodeDefs.getOrElseUpdate(label, (propertiesType, metadatas))

  override def onSaveEdges(edgeType: String, startLabel: String, endLabel: String,
      metadatas: Map[String, String], propertiesType: Map[String, String]): Unit =
    edgeDefs.getOrElseUpdate(edgeType, (startLabel, endLabel))

  import Turtle.local

  def render(): String = {
    val sb = new StringBuilder
    sb ++= "@prefix : <http://graft.local/ontology#> .\n"
    sb ++= "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
    sb ++= "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
    sb ++= "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n\n"
    sb ++= ": a owl:Ontology .\n\n"
    nodeDefs.foreach { case (label, (props, metas)) =>
      sb ++= s":${local(label)} a owl:Class ; rdfs:subClassOf owl:Thing .\n"
      props.toSeq.sortBy(_._1).foreach { case (p, t) =>
        xsd(t).foreach { x =>
          val kinds = "owl:DatatypeProperty" +:
            (if (functionalProps.contains(p)) Seq("owl:FunctionalProperty") else Nil)
          sb ++= s":${local(p)} a ${kinds.mkString(", ")} ; rdfs:domain :${local(label)} ; rdfs:range $x .\n"
        }
      }
      metas.keys.toSeq.sorted.foreach { k =>
        sb ++= s":${local(k)} a owl:AnnotationProperty .\n"
      }
      sb ++= "\n"
    }
    edgeDefs.foreach { case (tpe, (s, e)) =>
      val kinds = "owl:ObjectProperty" +: edgeTraits.getOrElse(tpe, Nil).map("owl:" + _)
      sb ++= s":${local(tpe)} a ${kinds.mkString(", ")} ; rdfs:domain :${local(s)} ; rdfs:range :${local(e)} .\n"
      inverseOf.get(tpe).foreach(inv => sb ++= s":${local(tpe)} owl:inverseOf :${local(inv)} .\n")
    }
    sb.result()
  }

  override def save(catalog: Catalog, outputDir: String): Unit = {
    Files.createDirectories(Paths.get(outputDir))
    Files.writeString(Paths.get(outputDir, "file.owl"), render())
  }
}

/** SHACL shapes export — parity with the reference's `ShaclCallback`
  * (graph_etl/callbacks.py:132-217): per label a closed `sh:NodeShape` with
  * typed property shapes (`sh:maxCount 1` when functional), per edge a
  * property shape with `sh:class` of the end label and `sh:nodeKind sh:IRI`.
  * Turtle to `{outputDir}/file.ttl` (callbacks.py:209-217). */
final class ShaclCallback(functionalProps: Set[String] = Set.empty) extends SchemaCallback {

  private def xsd(dtype: String): String = dtype match {
    case "Utf8"                     => "xsd:string"
    case d if d.startsWith("Int")   => "xsd:integer"
    case d if d.startsWith("Float") => "xsd:double"
    case "Boolean"                  => "xsd:boolean"
    case "Date"                     => "xsd:date"
    case "Datetime"                 => "xsd:dateTime"
    case _                          => "xsd:string"
  }

  private val nodeDefs = mutable.LinkedHashMap.empty[String, (Map[String, String], Map[String, String])]
  private val edgeDefs = mutable.LinkedHashMap.empty[String, (String, String)]

  override def onSaveNodes(label: String, propertiesType: Map[String, String],
      metadatas: Map[String, String], primaryKey: String,
      constraints: Seq[String], indexs: Seq[String]): Unit =
    nodeDefs.getOrElseUpdate(label, (propertiesType, metadatas))

  override def onSaveEdges(edgeType: String, startLabel: String, endLabel: String,
      metadatas: Map[String, String], propertiesType: Map[String, String]): Unit =
    edgeDefs.getOrElseUpdate(edgeType, (startLabel, endLabel))

  import Turtle.local

  def render(): String = {
    val sb = new StringBuilder
    sb ++= "@prefix : <http://graft.local/shapes#> .\n"
    sb ++= "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
    sb ++= "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
    sb ++= "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n\n"
    nodeDefs.foreach { case (label, (props, metas)) =>
      // closed shapes must ignore rdf:type: every targeted instance carries
      // it (sh:targetClass matches through it), so without the exemption
      // every single node fails validation against its own shape
      sb ++= s":${local(label)}Shape a sh:NodeShape ;\n  sh:targetClass :${local(label)} ;\n" +
        "  sh:closed true ;\n  sh:ignoredProperties ( rdf:type ) ;\n"
      val propShapes = props.toSeq.sortBy(_._1).map { case (p, t) =>
        val max = if (functionalProps.contains(p)) " sh:maxCount 1 ;" else ""
        s"  sh:property [ sh:path :${local(p)} ; sh:datatype ${xsd(t)} ;$max ]"
      } ++ metas.keys.toSeq.sorted.map { k =>
        s"  sh:property [ sh:path :${local(k)} ; sh:datatype xsd:string ; ]"
      } ++ edgeDefs.collect { case (tpe, (s, e)) if s == label =>
        s"  sh:property [ sh:path :${local(tpe)} ; sh:class :${local(e)} ; sh:nodeKind sh:IRI ; ]"
      }
      sb ++= propShapes.mkString(" ;\n")
      sb ++= " .\n\n"
    }
    sb.result()
  }

  override def save(catalog: Catalog, outputDir: String): Unit = {
    Files.createDirectories(Paths.get(outputDir))
    Files.writeString(Paths.get(outputDir, "file.ttl"), render())
  }
}

/** Turtle serialization helpers shared by the schema exporters. */
private[etl] object Turtle {
  /** Serialize an arbitrary name (Spark column, label, metadata key) as a
    * prefixed-name local part: characters outside the portable
    * [A-Za-z0-9_-] subset are percent-encoded per UTF-8 byte (PN_LOCAL's
    * PERCENT production), so 'first name' or 'price($)' still parse. */
  def local(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case c if (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-' => sb += c
      case c => c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => sb ++= f"%%${b & 0xff}%02X")
    }
    sb.result()
  }
}
