package graft.engine

/** Operational command surface over a declared [[Project]] — the
  * `dbt run / build / test / ls / run-operation` entry points
  * (`/root/reference/README.md:88-92,160-166`). Output is returned as
  * lines (and printed) so operations stay print-only — the reference's
  * safety invariant that generated DDL is never auto-executed
  * (`macros/list_orphaned_objects.sql:15,51`).
  */
object Cli {

  def run(project: Project, args: Seq[String]): Seq[String] = {
    val out = args.toList match {
      case "run" :: rest =>
        val res = project.run(selectArg(rest),
          exclude = excludeArg(rest),
          fullRefresh = rest.contains("--full-refresh"))
        res.results.map(r => s"${r.status.toUpperCase} ${r.id} ${r.durationMs}ms")
      case "build" :: rest =>
        val res = project.run(selectArg(rest), blockOnTestFailure = true,
          exclude = excludeArg(rest),
          fullRefresh = rest.contains("--full-refresh"))
        res.results.map(r => s"${r.status.toUpperCase} ${r.id} ${r.durationMs}ms")
      case "test" :: rest =>
        // dbt test only EVALUATES tests against existing relations — it
        // must not materialize models as a side effect (running them
        // would, e.g., append another batch to every incremental table).
        val res = project.testOnly(selectArg(rest))
        res.results.map(r => s"${r.status.toUpperCase} ${r.id}")
      case "ls" :: _ =>
        project.compile().nodes.keys.toSeq.sorted
      case "run-operation" :: "list_orphaned_objects" :: rest =>
        val kwargs = kwargsArg(rest)
        Macros.listOrphanedObjects(project.spark, project.compile(), project,
          schema = kwargs.getOrElse("schema", project.target.schema),
          outputDropCmd = kwargs.get("output_drop_cmd").contains("true"),
          outputRenameCmd = kwargs.get("output_rename_cmd").contains("true"))
      case "run-operation" :: "project_evaluator" :: _ =>
        val findings = Macros.evaluateProject(project.compile())
        if (findings.isEmpty) Seq("project_evaluator: no findings")
        else findings // advisory only — never fails the build
      case other =>
        Seq(s"unknown command: ${other.mkString(" ")} " +
          "(expected run|build|test|ls|run-operation)")
    }
    out.foreach(println)
    out
  }

  private def selectArg(rest: Seq[String]): String =
    rest.sliding(2).collectFirst {
      case Seq("--select", v) => v
    }.getOrElse("*")

  private def excludeArg(rest: Seq[String]): String =
    rest.sliding(2).collectFirst {
      case Seq("--exclude", v) => v
    }.getOrElse("")

  /** `--args '{k: v, k2: v2}'` — the reference passes YAML kwargs
    * (`README.md:163`); we accept the same flow-mapping subset. */
  private def kwargsArg(rest: Seq[String]): Map[String, String] =
    rest.sliding(2).collectFirst { case Seq("--args", v) => v }
      .map { raw =>
        raw.trim.stripPrefix("{").stripSuffix("}").split(",")
          .iterator.map(_.split(":", 2))
          .collect { case Array(k, v) => k.trim -> v.trim }
          .toMap
      }.getOrElse(Map.empty)
}
