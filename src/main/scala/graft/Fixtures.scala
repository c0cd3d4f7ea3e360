package graft

/** Resolves a committed fixture directory to an ABSOLUTE path: env override
  * first, else `<working dir>/fixtures/<name>` (sbt forks run with the repo
  * root as working dir, so any checkout location works — ADVICE r06 flagged
  * the previous hardcoded /root/repo defaults). Absolute because the DuckDB
  * oracle SQL embeds the path verbatim and the driver replays it from its
  * own working directory.
  */
object Fixtures {
  def dir(name: String, envKey: String): String =
    sys.env.getOrElse(envKey,
      new java.io.File(sys.props("user.dir"), s"fixtures/$name").getAbsolutePath)
}
