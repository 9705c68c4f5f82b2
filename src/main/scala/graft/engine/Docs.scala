package graft.engine

/** `dbt docs generate` analogue — the last verb of the reference's
  * first-run flow (`README.md:93`: debug / run / test / docs). dbt
  * emits manifest.json + catalog.json and renders them as a site; the
  * machine-readable artifact is the part with users (lineage tools,
  * CI diffing), so that is what this produces: one JSON document with
  * every node (kind, physical relation, materialization, column
  * name/type), the dependency edges, and the invocation id that query
  * tags carry (`QueryTags`) — linking docs to observability. Print-only;
  * the CLI's `--output` flag persists it.
  */
object Docs {

  def generate(project: Project): String = {
    val graph = project.compile()
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    def columnsOf(node: Node): Seq[(String, String)] = {
      def fromCatalog(physical: String): Seq[(String, String)] =
        if (project.spark.catalog.tableExists(physical))
          project.spark.table(physical).schema.fields.toSeq
            .map(f => f.name -> f.dataType.simpleString)
        else Nil
      try node match {
        case m: Model =>
          project.resolve(m.name).schema.fields.toSeq
            .map(f => f.name -> f.dataType.simpleString)
        case s: Seed => fromCatalog(project.physicalName(s))
        case s: Snapshot => fromCatalog(project.physicalName(s))
        case sd: SourceDef => project.sourceSchema(sd)
          .map(_.fields.toSeq.map(f => f.name -> f.dataType.simpleString))
          .getOrElse(Nil)
        case _: DataTest => Nil
      } catch { case _: Exception => Nil } // docs never fail the project
    }

    def physicalOf(node: Node): Option[String] = node match {
      case m: Model => Some(project.physicalName(m))
      case s: Seed => Some(project.physicalName(s))
      case s: Snapshot => Some(project.physicalName(s))
      case SourceDef(_, _, CatalogTable(t)) => Some(t)
      case SourceDef(_, _, ParquetPath(p)) => Some(p)
      case _ => None
    }

    def kindOf(node: Node): String = node match {
      case _: Model => "model"
      case _: Seed => "seed"
      case _: Snapshot => "snapshot"
      case _: SourceDef => "source"
      case _: DataTest => "test"
    }

    val nodesJson = graph.nodes.toSeq.sortBy(_._1).map { case (id, node) =>
      val cols = columnsOf(node)
        .map { case (n, t) => s"{${jstr(n)}: ${jstr(t)}}" }
        .mkString("[", ", ", "]")
      val mat = node match {
        case m: Model => Some(m.config.materialized.toString.toLowerCase)
        case _: Snapshot => Some("snapshot")
        case _ => None
      }
      val fields = Seq(
        Some(s"${jstr("kind")}: ${jstr(kindOf(node))}"),
        Some(s"${jstr("name")}: ${jstr(node.name)}"),
        physicalOf(node).map(p => s"${jstr("relation")}: ${jstr(p)}"),
        mat.map(m => s"${jstr("materialized")}: ${jstr(m)}"),
        Some(s"${jstr("columns")}: $cols")).flatten
      s"${jstr(id)}: {${fields.mkString(", ")}}"
    }.mkString("{", ", ", "}")

    val edgesJson = graph.edges.toSeq.sortBy(_._1).map { case (id, ups) =>
      s"${jstr(id)}: ${ups.toSeq.sorted.map(jstr).mkString("[", ", ", "]")}"
    }.mkString("{", ", ", "}")

    s"""{${jstr("target")}: ${jstr(project.target.name)}, """ +
      s"""${jstr("invocation_id")}: ${jstr(QueryTags.invocationId)}, """ +
      s"""${jstr("nodes")}: $nodesJson, ${jstr("edges")}: $edgesJson}"""
  }
}
