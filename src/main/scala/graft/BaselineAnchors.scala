package graft

/** Shared parser for BASELINE.md's "## rNN per-query seconds" anchor
  * tables (ADVICE r13: Bench.scala and RelationalCoreSpec carried
  * copies of the section/row regexes and different cwd fallbacks —
  * a format change could silently split the runtime drift gate from
  * the completeness test). Single source of truth: Bench consumes
  * [[anchorsFor]] (env-filtered values), the spec consumes
  * [[latestKeys]] (key completeness, deliberately env-agnostic —
  * a key must be anchored no matter which box anchored it).
  */
private[graft] object BaselineAnchors {
  private val sectRe = "(?s)## r(\\d+) per-query seconds.*?(?=\n## |\\z)".r
  private val rowRe = "\\|\\s*`([a-z0-9_]+)`\\s*\\|\\s*([0-9.]+)\\s*\\|".r
  private val envRe = "\\(local\\[(\\d+)\\],\\s*(sf[0-9.]+)".r

  /** BASELINE.md text: cwd copy if present, else the repo checkout
    * (the driver may run Bench from a bare directory). */
  def readText(): Option[String] = {
    val repoDir = Option(System.getProperty("user.dir"))
      .filter(d => java.nio.file.Files.exists(
        java.nio.file.Paths.get(d, "BASELINE.md")))
      .getOrElse("/root/repo")
    val p = java.nio.file.Paths.get(repoDir, "BASELINE.md")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p))
    else None
  }

  /** The highest-numbered per-query anchor section, if any. */
  def latestSection(text: String): Option[String] =
    sectRe.findAllMatchIn(text).toSeq
      .sortBy(_.group(1).toInt).lastOption.map(_.group(0))

  /** key → anchor seconds rows of one section. */
  def rows(section: String): Map[String, Double] =
    rowRe.findAllMatchIn(section)
      .map(r => r.group(1) -> r.group(2).toDouble).toMap

  /** True when the section's recorded "(local[N], sfX …)" header
    * matches this run's core count and fixture scale — anchors from
    * a different machine shape or scale must disarm the drift gate,
    * not flag half the board. */
  def envMatches(section: String, cpus: String, sfDir: String): Boolean =
    envRe.findFirstMatchIn(section).exists(e =>
      e.group(1) == cpus &&
        sfDir.stripSuffix("/").endsWith(e.group(2)))

  /** Env-filtered anchors for the drift gate (Bench): the LATEST
    * section whose header matches this run's env — not merely the
    * latest section overall. r16 anchors the board at BOTH 32 and 8
    * cores (VERDICT r15 #1), so one round now contributes two
    * same-numbered sections and the gate must pick the matching one
    * instead of disarming whenever the other env's table happens to
    * sit last in the file. */
  def anchorsFor(cpus: String, sfDir: String): Map[String, Double] =
    readText().map { text =>
      sectRe.findAllMatchIn(text).toSeq
        .sortBy(_.group(1).toInt).map(_.group(0))
        .filter(envMatches(_, cpus, sfDir))
        .lastOption.map(rows).getOrElse(Map.empty[String, Double])
    }.getOrElse(Map.empty)

  /** All keys in the latest anchor table, env-agnostic (the
    * completeness gate in RelationalCoreSpec). None = no table. */
  def latestKeys(): Option[Set[String]] =
    readText().flatMap(latestSection).map(rows(_).keySet)
}
