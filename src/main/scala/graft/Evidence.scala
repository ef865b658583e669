package graft

/** The evidence mains' shared artifact-write protocol: create the parent
  * dir, write the JSON, announce the path — and on failure WARN on stdout
  * (not stderr: sbt tags stderr lines `[error]`, and a benign
  * artifact-write failure must not masquerade as a run error in the
  * driver's tail capture — the Bench lesson, round 12). One copy, so a
  * change to the discipline (e.g. atomic tmp+rename) lands everywhere. */
object Evidence {
  /** @param echo also print the JSON one-line (off for artifacts too
    *             large for a log tail — the caller prints its own summary) */
  def writeArtifact(outFile: String, json: String, echo: Boolean = true): Unit = {
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      println(s"evidence written to $outFile")
    } catch {
      case e: Exception => println(s"WARN artifact write failed: $e")
    }
    if (echo) println(json.replaceAll("\n", " "))
  }
}
