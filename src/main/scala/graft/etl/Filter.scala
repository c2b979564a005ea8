package graft.etl

/** Metadata whitelist filter — exact truth table of the reference's
  * `Filter` (graph_etl/filters.py:4-58).
  *
  * Control-plane only (decides which parsers run / which files load);
  * no Spark operator is involved.
  */
final class GraphFilter {
  private var metadata: Map[String, List[String]] = Map.empty
  private var nodes: List[String] = Nil
  private var edges: List[String] = Nil

  /** filters.py:15-19 — NOTE: `add_metadata` *replaces* any previous values
    * for `key` (setattr), it does not accumulate. */
  def addMetadata(key: String, value: String): this.type = {
    metadata += (key -> List(value)); this
  }

  /** filters.py:21-25. */
  def addMetadatas(key: String, values: Seq[String]): this.type = {
    metadata += (key -> values.toList); this
  }

  def addNode(node: String): this.type = { nodes :+= node; this }
  def addNodes(ns: Seq[String]): this.type = { nodes ++= ns; this }
  def addEdge(edge: String): this.type = { edges :+= edge; this }
  def addEdges(es: Seq[String]): this.type = { edges ++= es; this }

  /** filters.py:51-52: skip iff the metadata shares >=1 key with the filter
    * but no (key, value) pair matches. */
  def skipParse(metadatas: Map[String, String]): Boolean = {
    val noPairMatches = metadatas.forall { case (k, v) =>
      !metadata.contains(k) || !metadata(k).contains(v)
    }
    val sharesKey = metadatas.keySet.intersect(metadata.keySet).nonEmpty
    noPairMatches && sharesKey
  }

  /** filters.py:54-55: a whitelisted node label always loads. */
  def skipLoadNode(metadatas: Map[String, String], node: String): Boolean =
    !nodes.contains(node) && skipParse(metadatas)

  /** filters.py:57-58. */
  def skipLoadEdge(metadatas: Map[String, String], edge: String): Boolean =
    !edges.contains(edge) && skipParse(metadatas)
}

/** Schema-event callback — the reference's `Callback` ABC
  * (graph_etl/callbacks.py:6-30), fired synchronously inside every
  * `saveNodes`/`saveEdges` (context.py:114-116, 213-220). Driver-side. */
trait SchemaCallback {
  def onSaveNodes(
      label: String,
      propertiesType: Map[String, String],
      metadatas: Map[String, String],
      primaryKey: String,
      constraints: Seq[String],
      indexs: Seq[String]): Unit

  def onSaveEdges(
      edgeType: String,
      startLabel: String,
      endLabel: String,
      metadatas: Map[String, String],
      propertiesType: Map[String, String]): Unit

  /** Fired once at the end of `load` so exporters can write their file
    * (the reference's `save()` on OWL/SHACL callbacks, callbacks.py:120-128,
    * 209-217). */
  def save(catalog: Catalog, outputDir: String): Unit = {}
}
