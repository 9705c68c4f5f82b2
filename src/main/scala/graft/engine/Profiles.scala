package graft.engine

/** Profiles-file loading — the reference's `~/.dbt/profiles.yml` contract
  * (`profiles.example.yml:1-25`): a project entry with a default
  * `target:` and an `outputs:` map of named environments, values
  * templatable with `{{ env_var('NAME') }}` /
  * `{{ env_var('NAME', 'default') }}`. Re-expressed for a Spark engine:
  * the connection keys that configured Snowflake (account/warehouse/
  * role/…) have no analogue — the session IS the connection — so an
  * output maps to [[Target]] via `schema` and `threads`.
  *
  * The parser covers exactly the YAML subset the reference file uses
  * (nested maps of scalar leaves, `#` comments, quoted strings) — no
  * YAML dependency is available offline, and a full YAML engine would be
  * surface area without users.
  */
object Profiles {

  /** Load a [[Target]] from a profiles file.
    * @param profile project entry to read; default = the file's first
    *                (the reference file holds one per project)
    * @param target  output to select; default = the entry's `target:` key
    */
  def load(path: String, profile: Option[String] = None,
      target: Option[String] = None): Target =
    fromYaml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)),
      profile, target)

  private[engine] def fromYaml(yaml: String, profile: Option[String] = None,
      target: Option[String] = None,
      env: Map[String, String] = sys.env): Target = {
    val tree = parseTree(yaml, env)
    val profName = profile.getOrElse(tree.keys.headOption.getOrElse(
      throw new IllegalArgumentException("profiles file declares no profile")))
    val prof = tree.getOrElse(profName,
      throw new IllegalArgumentException(
        s"no profile '$profName' (have: ${tree.keys.mkString(", ")})")) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(s"profile '$profName' is not a mapping")
    }
    val targetName = target.orElse(prof.get("target").map(_.toString)).getOrElse(
      throw new IllegalArgumentException(
        s"profile '$profName' has no default target and none was given"))
    val outputs = prof.get("outputs") match {
      case Some(m: Map[String @unchecked, Any @unchecked]) => m
      case _ => throw new IllegalArgumentException(
        s"profile '$profName' has no outputs mapping")
    }
    val out = outputs.getOrElse(targetName,
      throw new IllegalArgumentException(
        s"no output '$targetName' in profile '$profName' " +
          s"(have: ${outputs.keys.mkString(", ")})")) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(s"output '$targetName' is not a mapping")
    }
    Target(
      name = targetName,
      schema = out.getOrElse("schema",
        throw new IllegalArgumentException(
          s"output '$targetName' declares no schema")).toString,
      threads = out.get("threads").map(_.toString.toInt).getOrElse(16))
  }

  /** Indentation-nested maps of scalar leaves. Values get `env_var`
    * templating (missing var without default = error, like dbt) and
    * quote-stripping. */
  private def parseTree(yaml: String,
      env: Map[String, String]): Map[String, Any] = {
    val root = scala.collection.mutable.LinkedHashMap[String, Any]()
    // stack of (indent, map) from root to the map awaiting children
    var stack = List(-1 -> root)
    for (raw <- yaml.linesIterator) {
      val noComment =
        if (raw.trim.startsWith("#")) ""
        // strip trailing comments only outside quotes (conservative: the
        // reference file never mixes '#' into values)
        else raw
      val line = noComment.stripTrailing()
      if (line.trim.nonEmpty) {
        val indent = line.indexWhere(!_.isWhitespace)
        val body = line.trim
        val (k, v) = body.split(":", 2) match {
          case Array(k0, v0) => (k0.trim, v0.trim)
          case Array(k0) => (k0.trim, "")
        }
        stack = stack.dropWhile(_._1 >= indent)
        val parent = stack.head._2
        if (v.isEmpty) {
          val child = scala.collection.mutable.LinkedHashMap[String, Any]()
          parent(k) = child
          stack = (indent -> child) :: stack
        } else parent(k) = scalar(v, env)
      }
    }
    def freeze(m: scala.collection.mutable.LinkedHashMap[String, Any]): Map[String, Any] =
      m.view.mapValues {
        case c: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked] => freeze(c)
        case leaf => leaf
      }.toMap
    freeze(root)
  }

  private val EnvVarPat =
    raw"""\{\{\s*env_var\(\s*'([^']+)'\s*(?:,\s*'([^']*)'\s*)?\)\s*\}\}""".r

  private def scalar(v0: String, env: Map[String, String]): String = {
    val v = EnvVarPat.replaceAllIn(v0, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
          throw new IllegalArgumentException(
            s"env_var '${m.group(1)}' is not set and has no default"))))
    if (v.length >= 2 && (v.head == '\'' || v.head == '"') && v.last == v.head)
      v.substring(1, v.length - 1)
    else v
  }
}
